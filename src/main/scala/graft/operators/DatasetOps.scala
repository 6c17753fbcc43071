package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis

/** Dataset-assembly operators for a training pipeline: deterministic
  * train/val/test splitting and sequence packing. Both are pure
  * narrow-scan + window/aggregate shapes — no joins, no driver state —
  * so they parallelize to any corpus size.
  */
object DatasetOps {

  /** Deterministic split assignment by content-independent hash:
    * `md5(doc_id)` hex prefix thresholded lexicographically into
    * train (~80%), val (~10%), test (~10%).
    *
    * Hash-based (not modulo-based) assignment is the standard trick so
    * membership is stable under corpus growth and re-shuffling: a doc's
    * split never depends on which other docs exist. The hex-string
    * comparison ('cc' ≈ 204/256, 'e6' ≈ 230/256) keeps the expression
    * bit-identical between Spark and the DuckDB oracle without any
    * hex→int conversion.
    *
    * Returned as per-(split, lang) manifest counts — the summary a
    * pipeline run records; the per-doc assignment is the same
    * expression without the aggregate.
    */
  def splitCounts(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy(col("split"), col("lang"))
  }

  /** Sequence packing: assign documents to fixed token-budget bins,
    * greedily in doc_id order within a (lang, shard) stream, and
    * return the per-bin manifest.
    *
    * A document's bin is determined by the cumulative token count at
    * its START (`floor((cum − own)/budget)`), so bins are contiguous
    * runs and a document straddling a boundary stays whole in its
    * starting bin (bins may overflow by at most one document — the
    * no-truncation packing variant).
    *
    * The shard key (`doc_id % nShards`) bounds every window partition:
    * packing is embarrassingly parallel across (lang, shard) streams,
    * which is how it must run at 100 TB — a single per-language
    * ordered window would serialize each language through one task.
    */
  /** Context-window chunking: one row per (doc, chunk) for fixed-size
    * token windows with overlap — the slicing step before tokenized
    * training examples. Chunk starts advance by `chunk − overlap`;
    * the final chunk is truncated at the document end (a tail shorter
    * than `overlap` still gets its own row — simple, deterministic,
    * and exactly reproducible in SQL). Pure explode-over-sequence:
    * narrow, no shuffle, output rows ∝ total tokens / stride.
    */
  def chunkManifest(s: SparkSession, dir: String,
      chunk: Int = 128, overlap: Int = 32): DataFrame = {
    require(overlap < chunk, "overlap must be smaller than chunk")
    val step = (chunk - overlap).toLong
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(step))).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / step).cast("long").as("chunk_id"),
        col("start_tok"),
        least(lit(chunk.toLong), col("n_tokens") - col("start_tok")).as("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Domain-mixture planning: per-source sampling rates that realize a
    * target mixture under the "no upsampling" constraint. Target raw
    * weights are a deterministic function of the source name
    * (`1 + (srcNum % 3)`, normalized); the achievable token budget is
    * `B = min_s(tokens_s / weight_s)` — the largest total for which
    * every source can supply its share without repetition — and each
    * source's rate is `weight_s · B / tokens_s` (exactly 1.0 for the
    * binding source).
    *
    * Two tiny scalar aggregates (Σ weights, min ratio) attach as
    * broadcast one-row joins — the uncorrelated-scalar-subquery shape —
    * so the whole plan is one scan of documents plus two O(#sources)
    * reductions; #sources is small by nature, like the eval set in
    * [[decontaminate]].
    */
  def mixturePlan(s: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables.load(s, dir, "documents")
      .select(col("source"), TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("src_tokens"))
      .withColumn("w_raw",
        ((substring(col("source"), 4, 10).cast("int") % 3) + 1).cast("double"))
    val sumW = perSrc.agg(sum(col("w_raw")).as("sum_w"))
    val withW = perSrc.crossJoin(broadcast(sumW))
      .withColumn("wgt", col("w_raw") / col("sum_w"))
      .withColumn("ratio", col("src_tokens").cast("double") / col("wgt"))
    val budget = withW.agg(min(col("ratio")).as("budget"))
    withW.crossJoin(broadcast(budget))
      .withColumn("rate_raw", col("wgt") * col("budget") / col("src_tokens").cast("double"))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        graft.functions.Rounding.portableRound4(col("wgt")).as("weight"),
        graft.functions.Rounding.portableRound4(col("rate_raw")).as("sample_rate"),
        floor(col("rate_raw") * col("src_tokens").cast("double")).cast("long")
          .as("expected_tokens"))
      .orderBy(col("source"))
  }

  /** Temperature-scaled mixture shares — the standard multilingual /
    * multi-domain rebalancing knob (sampling exponent T < 1 as in
    * multilingual BERT/XLM-R and the Pile): source i's sampling share
    * goes from its natural token share p_i to p_i^T / Σ p_j^T, which
    * UP-weights small sources and flattens dominant ones without the
    * hand-set per-source weights [[mixturePlan]] uses. `boost` is the
    * up/down-sampling factor vs natural share (>1 = oversample).
    *
    * Scale shape: one corpus pass for per-source token counts
    * (map-side partials), then everything runs on the |sources|-row
    * table with two one-row broadcast totals — the corpus is never
    * touched again.
    */
  def mixtureTemperature(s: SparkSession, dir: String,
      temp: Double = 0.7): DataFrame = {
    val perSrc = Tables.load(s, dir, "documents")
      .select(col("source"), TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("src_tokens"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("total"))
    val shares = perSrc.crossJoin(broadcast(tot))
      .withColumn("p", col("src_tokens").cast("double") / col("total"))
      .withColumn("pt", pow(col("p"), lit(temp)))
    val z = shares.agg(sum(col("pt")).as("z"))
    shares.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        graft.functions.Rounding.portableRound4(col("p")).as("natural_share"),
        graft.functions.Rounding.portableRound4(col("pt") / col("z")).as("temp_share"),
        graft.functions.Rounding.portableRound4(
          (col("pt") / col("z")) / col("p")).as("boost"))
      .orderBy(col("source"))
  }

  /** Distinct token n-grams per `key` over (key, text). Token arrays
    * are materialized before the n-gram lambda (HOF lambdas get no
    * common-subexpression elimination — the measured 10× cliff).
    * Shared by [[decontaminateAgainst]] (key = doc) and
    * [[sourceOverlapMatrix]] (key = source) so the cliff-sensitive
    * shingle block exists exactly once.
    */
  private def ngramsBy(d: DataFrame, key: String, n: Int): DataFrame =
    d.select(col(key), TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(key),
        explode(transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*)))
          .as("gram"))
      .distinct()

  private def docNgrams(d: DataFrame, n: Int): DataFrame = ngramsBy(d, "doc_id", n)

  /** Eval-set decontamination against an EXPLICIT eval corpus:
    * training documents sharing at least one token n-gram with any
    * eval document, with the count of distinct shared n-grams per
    * contaminated doc. Both sides need (doc_id, text).
    *
    * The scale shape is what makes decontamination tractable at
    * 100 TB: the eval side is small by nature (benchmarks are
    * thousands of docs, not billions), so its distinct n-gram set
    * BROADCASTS and the training corpus streams through a map-side
    * hash join — the only shuffle is the final per-doc count (the
    * broadcast is asserted by a plan-shape spec so a config change
    * can't silently flip it to a sort-merge join).
    */
  def decontaminateAgainst(corpus: DataFrame, evalSet: DataFrame, n: Int = 3): DataFrame = {
    val evalGrams = docNgrams(evalSet, n).select(col("gram")).distinct()
    docNgrams(corpus, n)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .orderBy(col("doc_id"))
  }

  /** Oracle-checkable default: the deterministic pseudo-eval set
    * `doc_id % 97 == 0` stands in for a benchmark corpus (the driver's
    * DuckDB oracle can reproduce the split); the remaining docs are
    * the training side. Same operator as [[decontaminateAgainst]].
    */
  def decontaminate(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    decontaminateAgainst(
      d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0), n)
  }

  /** SEMANTIC decontamination — the embedding-space companion of
    * [[decontaminateAgainst]]: an eval example contaminates a training
    * document when their embeddings' cosine exceeds `tau`, catching
    * the paraphrased / reformatted benchmark leaks that exact n-gram
    * overlap misses (the check run alongside n-gram decontam in
    * published LLM data pipelines, e.g. SemDeDup-style screens).
    *
    * Output: one row per CONTAMINATED training vector — how many eval
    * vectors implicate it and the worst (max) cosine, rounded
    * portably. The uncontaminated corpus is the complement; reporting
    * the hits keeps the result benchmark-sized.
    *
    * Scale shape: the eval set is benchmark-sized by construction, so
    * it BROADCASTS and the train side is one narrow scan — a
    * BroadcastNestedLoopJoin whose condition (dot ≥ tau·|a|·|b|) is
    * the codegen'd [[graft.functions.ArrayDotProduct]]; per-doc
    * aggregation is map-side partial. Cost is |train|·|eval| dots,
    * embarrassingly parallel with NO shuffle of the train side; when
    * the eval side outgrows broadcast, route the train scan through
    * the persisted IVF index ([[Similarity]]) instead.
    *
    * Determinism: double dot products summed left-to-right are
    * bit-identical in Spark and DuckDB (the [[Similarity]] contract),
    * so the `cos >= tau` frontier — and therefore the row set — is
    * exact, not approximately, oracle-checkable.
    */
  def semanticDecontam(s: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    import graft.functions.Rounding.portableRound4
    val e = Similarity.emb(s, dir)
    val eval = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eval_id"), col("emb").as("eemb"), col("nrm").as("enrm"))
    val cos = graft.functions.VectorFunctions.arrayDot(col("emb"), col("eemb")) /
      (col("nrm") * col("enrm"))
    e.filter(col("vec_id") % 97 =!= 0)
      .join(broadcast(eval), cos >= tau)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_contaminating"),
        portableRound4(max(cos)).as("max_cos"))
      .orderBy(col("vec_id"))
  }

  /** Execute the [[mixturePlan]]: deterministically sample each source
    * at its planned rate and report achieved vs target per source.
    *
    * The per-doc uniform draw is a pure-integer multiplicative hash,
    * `((doc_id % P) · (2654435761 % P)) % P / P` with P = 1,000,003
    * (Knuth's constant, prime modulus): exactly reproducible in ANSI
    * SQL with no overflow at any doc_id (every intermediate < P²), so
    * the oracle plays it back bit-for-bit — and membership is a pure
    * function of doc_id, stable under corpus growth like the
    * [[splitCounts]] hash. The rate table is the plan's own (tiny)
    * output, broadcast onto a narrow (doc_id, source) scan; the only
    * shuffle is the final per-source count.
    */
  def mixtureSample(s: SparkSession, dir: String): DataFrame = {
    val p = 1000003L
    val rates = mixturePlan(s, dir).select(col("source"), col("sample_rate"))
    val u01 = (((col("doc_id") % p) * lit(2654435761L % p)) % p).cast("double") / p.toDouble
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(broadcast(rates), Seq("source"))
      .withColumn("keep", (u01 < col("sample_rate")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_sampled"),
        max(col("sample_rate")).as("target_rate"),
        graft.functions.Rounding.portableRound4(
          sum(col("keep")).cast("double") / count(lit(1)).cast("double"))
          .as("achieved_rate"))
      .orderBy(col("source"))
  }

  /** Cross-source contamination matrix: for every source pair, the
    * number of distinct token 3-grams both sources contain — the
    * between-corpus overlap report run before mixing sources into one
    * training set (exact-duplicate overlap is a special case; shared
    * n-grams catch partial/boilerplate leakage too).
    *
    * Scale shape — ONE wide shuffle, no join, 8-byte keys: grams are
    * hashed to 64 bits and reduced in a single
    * `groupBy(gram_hash).collect_set(source)` (map-side partials dedup
    * each partition's repeats before anything moves), then each
    * multi-source gram explodes into its ordered source pairs — at most
    * #sources²/2 rows per gram — and a tiny keyed count finishes. The
    * previous shape (distinct (source, gram) → gram-string self-join)
    * moved every gram STRING through two shuffles and rebuilt the hash
    * table at the join; this one moves each gram once, as a long.
    * Hashing before grouping trades a ~n²/2⁶⁴ collision probability
    * (≪10⁻⁶ even at 10⁹ distinct grams per pair) for an order-of-
    * magnitude cut in shuffle bytes — the right trade for a report
    * whose unit is "shared gram count".
    */
  def sourceOverlapMatrix(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val grams = d
      .select(col("source"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("source"),
        explode(transform(sequence(lit(0), size(col("toks")) - n),
          i => xxhash64(concat_ws(" ",
            (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))
          .as("gh"))
    val srcs = array_sort(col("srcs"))
    grams
      .groupBy(col("gh"))
      .agg(collect_set(col("source")).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(flatten(transform(srcs, (x, i) =>
        transform(slice(srcs, i + 2, size(srcs)),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def packingManifest(s: SparkSession, dir: String,
      budget: Int = 512, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), (col("doc_id") % nShards).as("shard"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin_id",
        floor((col("cum") - col("n_tokens")).cast("double") / budget).cast("long"))
      .groupBy(col("lang"), col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"), col("bin_id"))
  }

  /** Packing-efficiency report — the feedback loop on
    * [[packingManifest]]'s token budget: per language, how many bins
    * the packing produced, their average fill vs the budget, and how
    * many ran over (greedy cumulative binning can't split a document,
    * so a long doc straddling a boundary overfills its bin). Low fill
    * → budget too large for the doc-length mix (padding waste at
    * training time); many overfull bins → budget too small. Pure
    * metadata-scale rollup over the manifest.
    */
  def packingEfficiency(s: SparkSession, dir: String,
      budget: Int = 512, nShards: Int = 8): DataFrame =
    packingManifest(s, dir, budget, nShards)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("total_tokens"),
        graft.functions.Rounding.portableRound4(
          sum(col("bin_tokens")).cast("double") /
            (count(lit(1)) * budget).cast("double")).as("avg_fill"),
        sum((col("bin_tokens") > budget).cast("long")).as("n_overfull"))
      .orderBy(col("lang"))

  /** Balanced per-stratum downsampling: every language is cut to the
    * size of the SMALLEST language class, with the kept rows chosen by
    * rank of a deterministic integer hash — the class-rebalancing pass
    * run before training on skewed multilingual corpora. Unlike
    * rate-based Bernoulli sampling ([[mixtureSample]]) the output size
    * per stratum is EXACT, not expected.
    *
    * The hash is the same portable multiplicative scheme as
    * [[mixtureSample]] (pure BIGINT modular arithmetic — bit-identical
    * in any engine), and ties break on doc_id, so the selected set is
    * fully deterministic; `sampled_sum` (sum of kept doc_ids) lets the
    * oracle verify the exact membership, not just the count.
    *
    * Scale: one scan + a per-stratum window rank (shuffle on lang —
    * #langs partitions; for very skewed corpora the rank-by-hash can
    * be replaced by a two-pass threshold estimate, but the window form
    * is exact and the stratum count is small by nature) + a broadcast
    * one-row min. No driver state.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val p = 1000003L
    val hkey = ((col("doc_id") % p) * lit(2654435761L % p)) % p
    val ranked = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(hkey.asc, col("doc_id").asc)))
    val minClass = ranked.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .agg(min(col("n_docs")).as("m"))
    ranked.crossJoin(broadcast(minClass))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") <= col("m"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("rn") <= col("m"), col("doc_id")).otherwise(0L)).as("sampled_sum"))
      .orderBy(col("lang"))
  }
}
