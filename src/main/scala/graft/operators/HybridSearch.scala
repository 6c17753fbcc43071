package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Rounding, VectorFunctions}

/** Hybrid lexical+semantic retrieval with reciprocal-rank fusion — the
  * standard way a training-data / RAG pipeline combines a keyword index
  * with an embedding index (Cormack et al.'s RRF: fused(d) =
  * Σ_lists 1/(c + rank_list(d)), robust to incomparable score scales
  * because only RANKS cross lists).
  *
  * Scale shape: each leg is an already-scale-shaped retrieval —
  * [[TextQueries.bm25Search]] (one documents scan + broadcast small
  * sides) and a brute cosine pass (one embeddings scan against a
  * broadcast 1-row query vector; swap in the IVF probe for a persisted
  * index at 100 TB). Everything AFTER the legs is bounded by kEach
  * rows per leg: the rank windows and the fusion join never see the
  * corpus, so the whole fusion stage is driver-scale work no matter
  * the input size.
  *
  * Determinism: both legs rank on portable-rounded scores with id
  * tie-breaks (the q_bm25 / q_knn_brute pattern), so ranks — and the
  * fused output — are engine-portable and DuckDB-oracle-checkable.
  */
object HybridSearch {

  /** Fuse BM25 top-`kEach` for `queryTerms` with cosine top-`kEach`
    * around document `queryVecId`'s embedding; return the top `k` by
    * RRF score. Output: (doc_id, rrf, t_rnk, v_rnk) with null rank for
    * a doc only one leg surfaced.
    */
  def rrfFusion(s: SparkSession, dir: String,
      queryTerms: Seq[String] = Seq("spark", "join", "window"),
      queryVecId: Long = 0L, kEach: Int = 20, k: Int = 10,
      rrfC: Int = 60): DataFrame = {
    // both rank windows are global but bounded: ≤ kEach rows (text) and
    // corpus-wide only under the window for vectors — see vRanked note
    val noPart = Window.orderBy(col("score").desc, col("doc_id").asc)

    val tRanked = TextQueries.bm25Search(s, dir, queryTerms, limit = kEach)
      .select(col("doc_id"), col("score"))
      .withColumn("t_rnk", row_number().over(noPart))
      .select(col("doc_id"), col("t_rnk"))

    val e = Similarity.emb(s, dir)
    val qv = e.filter(col("vec_id") === queryVecId)
      .select(col("emb").as("q_emb"), col("nrm").as("q_nrm"))
    // 1-row broadcast scalar attach (the knnBruteForce pattern); rank
    // by rounded cosine then cut to kEach. The window here is a global
    // top-k over the corpus — at index scale this leg is served by the
    // persisted IVF probe instead (IvfIndex.knnIndexed), which returns
    // the same (doc_id, rank) contract from cell-pruned candidates.
    val wVec = Window.orderBy(col("cos").desc, col("vec_id").asc)
    val vRanked = e.crossJoin(broadcast(qv))
      .withColumn("cos", Rounding.portableRound4(
        VectorFunctions.arrayDot(col("emb"), col("q_emb")) /
          (col("nrm") * col("q_nrm"))))
      .withColumn("v_rnk", row_number().over(wVec))
      .filter(col("v_rnk") <= kEach)
      .select(col("vec_id").as("doc_id"), col("v_rnk"))

    tRanked.join(vRanked, Seq("doc_id"), "full_outer")
      .withColumn("rrf", Rounding.portableRound4(
        coalesce(lit(1.0) / (lit(rrfC) + col("t_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfC) + col("v_rnk")), lit(0.0))))
      .select(col("doc_id"), col("rrf"),
        col("t_rnk").cast("long").as("t_rnk"),
        col("v_rnk").cast("long").as("v_rnk"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }
}
