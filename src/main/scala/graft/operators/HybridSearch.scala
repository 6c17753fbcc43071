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

  /** Cross-encoder-style rerank over the fused candidates — the
    * second retrieval stage every production search/RAG pipeline runs:
    * stage 1 (RRF fusion of cheap per-document scores) narrows the
    * corpus to k candidates, stage 2 scores each (query, document)
    * PAIR with a model that sees both together, which is exactly what
    * the per-list rank scores cannot express. The pair scorer here is
    * a deterministic stand-in for a neural cross-encoder (no model
    * runtime in this container — the [[Multimodal.DecodeStub]]
    * contract): term-proximity evidence, the classic pre-neural pair
    * feature (pairs of DISTINCT query terms co-occurring within
    * `proxWindow` raw-token positions, weight 10) plus query-term
    * occurrence count. Integer arithmetic end-to-end, so the rerank is
    * exactly DuckDB-oracle-checkable.
    *
    * Scale shape — the part that survives swapping in a real model:
    * the expensive pair scorer touches ONLY the k fused candidates,
    * never the corpus. The candidate id set broadcasts into a
    * semi-join on the documents scan (one narrow pass fetches k
    * texts), and everything after is k-row work. A 100 TB corpus
    * changes stage 1's cost, not stage 2's.
    */
  def ceRerank(s: SparkSession, dir: String,
      queryTerms: Seq[String] = Seq("spark", "join", "window"),
      queryVecId: Long = 0L, kEach: Int = 20, k: Int = 10,
      rrfC: Int = 60, proxWindow: Int = 8): DataFrame = {
    import s.implicits._
    // resolve the fused top-k to a LOCAL relation: stage 2 references
    // the candidate set from four places (id fetch, tf leg, proximity
    // leg, final join), and without materialization the planner
    // replays the ENTIRE stage-1 subtree at each reference — measured
    // 15 documents scans + 8 embeddings scans in the initial plan,
    // 1.8 s vs 0.8 s for one evaluation. The collect is k rows BY
    // CONTRACT (a query parameter, not corpus-dependent state — the
    // knn-query-vector convention), so driver transit is metadata-
    // scale and the returned plan is self-contained.
    val fused = rrfFusion(s, dir, queryTerms, queryVecId, kEach, k, rrfC)
      .select(col("doc_id"), col("rrf")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .toDF("doc_id", "rrf")
    // k candidate texts via broadcast semi-join — the corpus scan stays
    // narrow (doc_id, text) and nothing corpus-sized shuffles
    val hits = graft.Tables.load(s, dir, "documents")
      .join(broadcast(fused.select(col("doc_id"))), Seq("doc_id"))
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        lower(regexp_replace(col("tok"), "[^A-Za-z]+", "")).as("word"))
      .filter(col("word").isin(queryTerms: _*))
    val tf = hits.groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    // proximity pairs: distinct-term hits within the window; the self
    // join carries only the k candidates' query-term hits (tiny)
    val prox = hits.as("a").join(hits.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.word") < col("b.word") &&
          abs(col("a.pos") - col("b.pos")) <= proxWindow)
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_prox"))
    val noPart = Window.orderBy(col("ce_score").desc, col("doc_id").asc)
    fused
      .join(tf, Seq("doc_id"), "left")
      .join(prox, Seq("doc_id"), "left")
      .withColumn("ce_score",
        (coalesce(col("n_prox"), lit(0L)) * 10 +
          coalesce(col("n_hits"), lit(0L))).cast("long"))
      .withColumn("rank", row_number().over(noPart).cast("long"))
      .select(col("doc_id"), col("rrf"), col("ce_score"), col("rank"))
      .orderBy(col("rank"))
  }
}
