package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[knnBruteForce]] — exact cosine top-k. The query set is tiny and
  *    broadcast; the corpus is scanned once, cosine evaluated inside
  *    codegen'd higher-order functions, and top-k taken with a rank
  *    window partitioned by query. Cost: O(|corpus| × |queries|) FLOPs,
  *    one scan, no corpus shuffle — the right baseline even at scale
  *    when |queries| is small.
  *  - [[knnIvf]] — IVF-style approximate path: corpus vectors are
  *    assigned to their nearest centroid once (an O(C) broadcast
  *    lookup), queries probe only the `nprobe` nearest cells, so the
  *    per-query cost drops to the probed fraction of the corpus. This
  *    is the 100 TB shape: the assignment is a narrow column you'd
  *    persist/bucket by, and each query touches a few cells.
  *
  * All arithmetic is double (floats upcast first) so results are
  * deterministic and match the DuckDB oracle.
  */
object Similarity {

  def toDouble(arr: Column): Column = transform(arr, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("emb"), col("label"))

  /** Q-SIM: exact cosine top-k for a fixed query set (vec_id < 10),
    * k=5, self-match excluded. Rank ties broken by neighbor id.
    */
  def knnBruteForce(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("emb"), col("q_emb")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF-style ANN: deterministic centroids (every 50th vector), each
    * corpus vector assigned to its nearest centroid, queries probe the
    * `nprobe` nearest cells. Returns same schema as brute force; recall
    * vs the exact result is asserted in SimilaritySpec.
    */
  def knnIvf(s: SparkSession, dir: String, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent_emb"))

    // assignment: nearest centroid per vector (broadcast C centroids)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cent_id").asc)
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("c_cos", cosine(col("emb"), col("cent_emb")))
      .withColumn("a_rnk", row_number().over(wAssign))
      .filter(col("a_rnk") === 1)
      .select(col("vec_id"), col("emb"), col("cent_id"))

    // queries probe their nprobe nearest cells
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("q_cos").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("q_cos", cosine(col("q_emb"), col("cent_emb")))
      .withColumn("p_rnk", row_number().over(wProbe))
      .filter(col("p_rnk") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cent_id"))

    // search only the probed cells
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("emb"), col("q_emb")), 4))
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
