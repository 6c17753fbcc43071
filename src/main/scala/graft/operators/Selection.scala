package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Rounding.portableRound4

/** Data-selection operators for training-corpus curation: statistical
  * document scoring against corpus-level language models.
  *
  * Two complementary shapes:
  *  - [[surprisal]]: exact unigram-LM scoring — the perplexity proxy a
  *    curation pipeline uses for difficulty binning / outlier triage.
  *    Exact over the corpus's own token distribution, so the model
  *    side is a token-keyed aggregate (|vocab| rows).
  *  - [[dsirWeights]]: hashed-bucket importance weights in the style
  *    of Data Selection with Importance Resampling (DSIR, Xie et al.
  *    2023, arXiv:2302.03169): score each document by the
  *    log-likelihood ratio of a TARGET distribution vs the RAW corpus
  *    distribution over hashed token buckets. Hashing bounds the model
  *    at a FIXED size (here 256 buckets; 2^20 at production scale)
  *    regardless of vocabulary growth — this is the scale path when
  *    the exact vocab no longer broadcasts.
  *
  * Both scoring passes are groupBy-partial-aggregate + one bounded
  * join; the corpus is scanned, never self-joined.
  */
object Selection {

  private def tokens(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(toks).as("tok"))
  }

  /** Mean unigram surprisal per document: -mean(ln p(token)) where p
    * is the corpus's own unigram distribution. High = rare-token-heavy
    * (specialist or noisy text), low = stopword-heavy boilerplate.
    *
    * Scale shape: the model is `counts` (one row per distinct token —
    * the same aggregate [[TrainingPrep.vocabulary]] builds) joined to
    * the per-doc-per-token tf table. Both sides of that join are
    * DISTINCT-token-keyed (tf ≤ docs × distinct-per-doc, counts =
    * |vocab|), so the shuffle moves the aggregated tables, never raw
    * token occurrences; Spark broadcasts `counts` when it fits (it
    * does at any vocab that fits an executor), and the stopword skew
    * on the token key is bounded because tf has at most one row per
    * (doc, token). When the vocabulary itself stops fitting anywhere,
    * [[dsirWeights]]'s fixed-width hashed model is the answer.
    */
  def surprisal(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(s, dir)
    val tf = t.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    // counts and total both DERIVE from the tf aggregate rather than
    // re-reading the token stream: all three branches then share one
    // identical scan→Generate→Exchange(doc_id,tok) subtree, which
    // Spark's ReuseExchange collapses — the corpus is tokenized and
    // shuffled ONCE (plan-spec'd in SelectionSpec). A naive
    // `t.groupBy(tok)` for the model side would tokenize 100 TB a
    // second (and third) time.
    val counts = tf.groupBy(col("tok")).agg(sum(col("tf")).as("n"))
    // one-row total → broadcast cross join (same pattern as q_tfidf)
    val total = counts.agg(sum(col("n")).as("total"))
    tf.join(counts, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        portableRound4(
          sum(col("tf") * -log(col("n").cast("double") / col("total")))
            / sum(col("tf"))).as("surprisal"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style hashed importance weights: per document, the summed
    * log-ratio ln(p_target(b) / p_raw(b)) over its tokens' hash
    * buckets, add-one smoothed. Target distribution here: English
    * documents (`lang = 'en'`) — "reweight the raw crawl toward the
    * target domain".
    *
    * The bucket key is the first two hex chars of md5(token) — an
    * engine-portable 256-way hash (Spark and DuckDB both md5 the
    * UTF-8 bytes), the same trick the train/val/test split uses for
    * portable assignment. Production sizing uses more hex chars
    * (3 → 4096, 5 → 2^20 buckets); the shape is identical.
    *
    * Scale shape: ONE conditional 256-row aggregate builds both the
    * raw and target bucket counts (map-side partials collapse each
    * scan partition to ≤256 rows), broadcast back over the token
    * stream, then one groupBy(doc_id) with partial aggregation — two
    * corpus passes total (model, then scoring), which is the minimum:
    * the model must exist before any document can be scored. The
    * model size is FIXED — no vocabulary growth, no skew (buckets are
    * md5-uniform), no corpus shuffle beyond the per-doc rollup.
    */
  def dsirWeights(s: SparkSession, dir: String, targetLang: String = "en"): DataFrame = {
    val t = tokens(s, dir).withColumn("b", substring(md5(col("tok")), 1, 2))
    // raw and target bucket counts in ONE conditional aggregate (one
    // corpus pass builds the whole model — a separate filtered
    // aggregate for the target would re-tokenize the corpus); a
    // target-absent bucket naturally counts ct=0, which IS the
    // smoothing floor, so no outer join is needed either
    val model = t.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === targetLang, 1)).as("ct"))
    val totals = model.agg(sum(col("cr")).as("tot_r"), sum(col("ct")).as("tot_t"))
    val weights = model
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + lit(1)).cast("double")
            / (col("tot_t") + lit(256)).cast("double"))
          - log((col("cr") + lit(1)).cast("double")
            / (col("tot_r") + lit(256)).cast("double"))).as("w"))
    t.join(broadcast(weights), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        portableRound4(sum(col("w"))).as("log_weight"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("log_weight"))
      .orderBy(col("doc_id"))
  }

  /** Per-document BIGRAM cross-entropy under the corpus's own add-k
    * bigram model — the CCNet / KenLM-shaped "score text by LM
    * perplexity" data-selection signal, one order above [[surprisal]]:
    * a document full of individually-common words in improbable
    * ORDER (shuffled text, keyword stuffing, MT soup) scores high
    * here while unigram surprisal cannot see it.
    *
    * Model: P(b|a) = (B(a,b) + k) / (U(a) + k·V), add-k smoothed
    * (k = 0.5), with U(a) = Σ_b B(a,b) the CONTEXT total and V the
    * distinct-continuation count — every model relation DERIVES from
    * the one per-doc bigram tf aggregate (the [[surprisal]]
    * ReuseExchange discipline: the corpus is exploded into positioned
    * bigrams and shuffled ONCE; B, U and V are reaggregations of that
    * same subtree, never a re-tokenize).
    *
    * Scale shape: tf ≤ docs × distinct-bigrams-per-doc and B = bigram
    * vocabulary; their join is bigram-keyed (two aggregated tables —
    * raw occurrences never shuffle twice); U is context-vocab-sized
    * (broadcast when it fits, shuffle-join on `a` past that); V and
    * k·V ride a one-row broadcast cross join. The per-doc rollup is
    * one groupBy(doc_id) with map-side partials. Output is the
    * portable-rounded mean -log₂ P — cross-entropy in bits/bigram
    * (perplexity = 2^H, monotone, left to the consumer so the gate
    * compares one rounded double, not a pow).
    */
  def bigramCrossEntropy(s: SparkSession, dir: String, k: Double = 0.5): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val tf = Tables.load(s, dir, "documents")
      .select(col("doc_id"), toks.as("ws"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(ws, 1, size(ws) - 1)," +
          " (w, i) -> struct(w AS a, element_at(ws, i + 2) AS b))")).as("g"))
      .select(col("doc_id"), col("g.a"), col("g.b"))
      .groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("tf"))
    val bigrams = tf.groupBy(col("a"), col("b")).agg(sum(col("tf")).as("bn"))
    val contexts = bigrams.groupBy(col("a")).agg(sum(col("bn")).as("un"))
    val vocab = bigrams.select(col("b")).distinct().agg(count(lit(1)).as("v"))
    tf.join(bigrams, Seq("a", "b"))
      .join(contexts, Seq("a"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        portableRound4(
          sum(col("tf") * -(
            log((col("bn") + lit(k)) /
              (col("un") + lit(k) * col("v"))) / log(lit(2.0))))
            / sum(col("tf"))).as("cross_entropy"))
      .select(col("doc_id"), col("n_bigrams"), col("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** SemDeDup-style semantic prune (Abbas et al. 2023,
    * arXiv:2303.09540): from the exact cosine near-dup pair graph at
    * `threshold`, keep each vector unless a LOWER-id vector sits
    * within the threshold; dropped vectors report the minimum such
    * lower-id neighbor as `dup_of` (-1 for kept — output stays
    * all-scalar BIGINT). This is the keep/drop DECISION layer over
    * [[Dedup.embeddingNearDups]]'s pair detection: greedy min-id
    * canonicalization, the same rule the exact-hash canonical map
    * uses, so chains (a~b~c, a!~c) drop every non-minimal member.
    *
    * Scale shape: pair detection reads the PERSISTED near-dup index
    * ([[Dedup.embeddingNearDupsIndexed]] — row-identical to the ad-hoc
    * join for any frozen centroid set, so the decision layer never
    * re-trains cell pruning, and a gate run shares one index build
    * with the pair query); the decision itself adds one aggregate over
    * the PAIR list (|pairs| rows, not |corpus|²) and a left join back
    * to the id column of the corpus.
    */
  def semanticKeep(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val pairs = Dedup.embeddingNearDupsIndexed(s, dir, threshold)
    val dupOf = pairs.groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("vec_a")).as("dup_min"))
    Similarity.emb(s, dir).select(col("vec_id"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("dup_min").isNull, lit(1L)).otherwise(lit(0L)).as("kept"),
        coalesce(col("dup_min"), lit(-1L)).as("dup_of"))
      .orderBy(col("vec_id"))
  }
}
