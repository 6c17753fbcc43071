package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[knnBruteForce]] — exact cosine top-k. The query set is tiny and
  *    broadcast; the corpus is scanned once, cosine evaluated by the
  *    codegen'd [[graft.functions.ArrayDotProduct]] expression, top-k
  *    taken with a rank window partitioned by query. Cost:
  *    O(|corpus| × |queries|) FLOPs, one scan, no corpus shuffle — the
  *    right baseline even at scale when |queries| is small.
  *  - [[knnIvf]] — IVF-style approximate path: corpus vectors are
  *    assigned to their nearest centroid once (an O(C) broadcast
  *    lookup), queries probe only the `nprobe` nearest cells, so the
  *    per-query cost drops to the probed fraction of the corpus. This
  *    is the 100 TB shape: the assignment is a narrow column you'd
  *    persist/bucket by, and each query touches a few cells.
  *
  * L2 norms are computed ONCE per vector and carried as a column;
  * pairwise cosine is then a single dot + divide. All arithmetic is
  * double (floats upcast first), summation left-to-right — bit-equal
  * to the DuckDB oracle.
  */
object Similarity {

  def toDouble(arr: Column): Column = transform(arr, _.cast("double"))

  /** Exact cosine via the codegen'd dot expression (norms recomputed —
    * use the norm-column form in pairwise loops).
    */
  def cosine(a: Column, b: Column): Column =
    VectorFunctions.arrayDot(a, b) /
      (VectorFunctions.l2Norm(a) * VectorFunctions.l2Norm(b))

  /** embeddings with per-row precomputed norm. */
  private[operators] def emb(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"), col("label"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("emb")))
  }

  /** Q-SIM: exact cosine top-k for a fixed query set (vec_id < 10),
    * k=5, self-match excluded. Rank ties broken by neighbor id.
    */
  def knnBruteForce(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = emb(s, dir)
    val q = e.select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
      col("nrm").as("q_nrm")).filter(col("query_id") < 10)
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.Rounding.portableRound4(
        VectorFunctions.arrayDot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Lloyd-refined centroids: start from the deterministic seeds
    * (every 50th vector) and run `iters` k-means steps entirely as
    * DataFrame ops — assign by max cosine, recompute each centroid as
    * the element-wise mean of its members (posexplode → avg per
    * (cell, dim) → reassemble ordered). Deterministic given
    * deterministic seeds; all shuffles are on (cell, dim) pairs, never
    * on vector pairs.
    */
  def kmeansCentroids(e: DataFrame, iters: Int = 2): DataFrame = {
    var cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"),
        col("nrm").as("cent_nrm"))
    for (_ <- 0 until iters) {
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("cent_id").asc)
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("c_cos",
          VectorFunctions.arrayDot(col("emb"), col("cent_emb")) / (col("nrm") * col("cent_nrm")))
        .withColumn("a_rnk", row_number().over(wAssign))
        .filter(col("a_rnk") === 1)
        .select(col("vec_id"), col("emb"), col("cent_id"))
      cents = assigned
        .select(col("cent_id"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("pairs"))
        .select(col("cent_id"), transform(col("pairs"), _.getField("m")).as("cent_emb"))
        .withColumn("cent_nrm", VectorFunctions.l2Norm(col("cent_emb")))
    }
    cents
  }

  /** IVF-style ANN: deterministic centroids (every 50th vector), each
    * corpus vector assigned to its nearest centroid, queries probe the
    * `nprobe` nearest cells. Returns same schema as brute force; recall
    * vs the exact result is asserted in DedupSimilaritySpec.
    */
  def knnIvf(s: SparkSession, dir: String, k: Int = 5, nprobe: Int = 4,
      kmeansIters: Int = 0): DataFrame = {
    val e = emb(s, dir)
    val cents =
      if (kmeansIters > 0) kmeansCentroids(e, kmeansIters)
      else e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"),
          col("nrm").as("cent_nrm"))

    // assignment: nearest centroid per vector (broadcast C centroids)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cent_id").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("c_cos",
        VectorFunctions.arrayDot(col("emb"), col("cent_emb")) / (col("nrm") * col("cent_nrm")))
      .withColumn("a_rnk", row_number().over(wAssign))
      .filter(col("a_rnk") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"), col("cent_id"))

    // queries probe their nprobe nearest cells
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("q_cos").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("q_cos",
        VectorFunctions.arrayDot(col("q_emb"), col("cent_emb")) / (col("q_nrm") * col("cent_nrm")))
      .withColumn("p_rnk", row_number().over(wProbe))
      .filter(col("p_rnk") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cent_id"))

    // search only the probed cells
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", graft.functions.Rounding.portableRound4(
        VectorFunctions.arrayDot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm"))))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
