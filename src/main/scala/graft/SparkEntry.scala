package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 that is SQL-expressible has BOTH a
  * `queries` entry and an `oracleSql` entry (DuckDB dialect, same
  * column names, computed ints cast to BIGINT, doubles rounded after
  * aggregation so results are summation-order independent). Non-SQL
  * ops (MinHash/SimHash LSH, IVF ANN) have queries entries only and are
  * cross-checked in ScalaTest against their exact counterparts.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core (SURVEY §2.2: scans/filters/projection/agg)
    "q1_pricing" -> (Relational.pricingSummary _),
    "q_filter_project" -> (Relational.filterProject _),
    "q_star_revenue" -> (Relational.starRevenue _),
    "q_topk_segment" -> (Relational.topOrdersPerSegment _),
    // same result via the bounded-heap UDAF (map-side ≤k rows/group
    // instead of a full-fact window sort) — plan shape spec-asserted
    "q_topk_heap" -> (Relational.topOrdersPerSegmentAgg _),
    "q_anti_no_orders" -> (Relational.customersWithoutOrders _),
    "q_semi_big_spenders" -> (Relational.bigSpenders _),
    "q_setops_custkeys" -> (Relational.setOpsCustkeys _),
    "q_setops_all" -> (Relational.setOpsAll _),
    "q_left_join" -> (Relational.leftJoinOrders _),
    "q_full_outer" -> (Relational.fullOuterYears _),
    "q_order_stats" -> (Relational.orderStats _),
    "q_rollup_revenue" -> (Relational.rollupRevenue _),
    "q_percentiles" -> (Relational.percentiles _),
    "q_string_funcs" -> (Relational.stringFuncs _),
    "q_date_funcs" -> (Relational.dateFuncs _),
    "q_above_avg" -> (Relational.aboveAvgOrders _),
    "q_pivot" -> (Relational.pivotRevenue _),
    "q_minmax_by" -> (Relational.minMaxBy _),
    "q_running" -> (Relational.runningWindows _),
    "q_cube_orders" -> (Relational.cubeOrders _),
    "q_approx_distinct" -> (Relational.approxDistinct _),
    "q_approx_percentile" -> (Relational.approxPercentiles _),
    // exact interpolated percentiles: the hash-verified companion the
    // approx family is judged against
    "q_percentile_exact" -> (Relational.percentilesExact _),
    "q_grouping_sets" -> (Relational.groupingSetsOrders _),
    "q_scalar_subquery" -> (Relational.scalarSubquery _),
    "q_exists_subquery" -> (Relational.existsSubquery _),
    "q_ntile" -> (Relational.ntileAnalytics _),
    "q_string_agg" -> (Relational.stringAgg _),
    "q_unpivot" -> (Relational.unpivotRevenue _),
    "q_conditional_agg" -> (Relational.conditionalAgg _),
    "q_stats_agg" -> (Relational.statsAgg _),
    "q_window_range" -> (Relational.rangeFrameOrders _),
    "q_nav_windows" -> (Relational.navigationWindows _),
    "q_regex_funcs" -> (Relational.regexFuncs _),
    "q_bigram_freq" -> ((s: SparkSession, d: String) => TextQueries.bigramFreq(s, d)),
    "q_pmi" -> ((s: SparkSession, d: String) => TextQueries.pmiCollocations(s, d)),
    // inverted-index query surface over documents (SURVEY §2.3 Q1-Q5)
    "q_doc_index" -> (TextQueries.docIndex _),
    "q_doc_posting" -> (TextQueries.docPosting _),
    "q_doc_topk_letter" -> (TextQueries.topkPerLetter _),
    "q_doc_bool" -> (TextQueries.boolRetrieval _),
    "q_corpus_stats" -> (TextQueries.corpusStats _),
    "q_tfidf" -> ((s: SparkSession, d: String) => TextQueries.tfidfSearch(s, d)),
    "q_phrase" -> ((s: SparkSession, d: String) => TextQueries.phraseSearch(s, d)),
    // text analysis (north-star ops)
    "q_text_quality" -> (TextQueries.textQuality _),
    "q_lang_id" -> (TextQueries.langId _),
    "q_fingerprint" -> (TextQueries.fingerprints _),
    "q_repetition" -> (TextQueries.repetition _),
    // boilerplate-span coverage (C4-style repeated-template signal)
    "q_boilerplate" -> ((s: SparkSession, d: String) => TextQueries.boilerplate(s, d)),
    // Lee-et-al exact repeated-span coverage: EVERY 8-token window in
    // >= 2 distinct docs (unbounded repeated vocabulary, shuffle join —
    // vs boilerplate's broadcast top-50)
    "q_repeated_spans" -> ((s: SparkSession, d: String) =>
      TextQueries.repeatedSpans(s, d)),
    // boilerplate strip: covered spans removed, reconstruction md5-verified
    "q_boilerplate_strip" -> ((s: SparkSession, d: String) => TextQueries.boilerplateStrip(s, d)),
    // exact top-k token counts: the hash-verified companion of the
    // q_heavy_hitters sketch (same normalized word universe)
    "q_heavy_hitters_exact" -> ((s: SparkSession, d: String) => TextQueries.topTokensExact(s, d)),
    // delta+varint posting compression: codec byte accounting is
    // hash-verified (oracle recomputes varint lengths by case-ladder)
    "q_posting_compression" -> ((s: SparkSession, d: String) => TextQueries.postingCompression(s, d)),
    // index snapshot diff: per-word df movement between corpus versions
    "q_index_diff" -> ((s: SparkSession, d: String) => TextQueries.indexDiff(s, d)),
    // rows-only BY CONSTRUCTION: deflate byte counts are a compressor
    // property, not a data-model property (no engine-portable oracle);
    // behavior pinned in CompressionSignalSpec
    "q_compress_ratio" -> ((s: SparkSession, d: String) => TextQueries.compressRatio(s, d)),
    // curation (composed pipeline)
    "q_curation" -> ((s: SparkSession, d: String) => Curation.decisions(s, d)),
    // per-domain document cap (bounded-heap top-k per source, no window)
    "q_domain_cap" -> ((s: SparkSession, d: String) => Curation.domainCap(s, d)),
    "q_curation_funnel" -> (Curation.funnel _),
    // dataset assembly
    "q_train_split" -> (DatasetOps.splitCounts _),
    "q_seq_packing" -> ((s: SparkSession, d: String) => DatasetOps.packingManifest(s, d)),
    // packing feedback: per-lang bin fill vs budget + overfull count
    "q_pack_efficiency" -> ((s: SparkSession, d: String) => DatasetOps.packingEfficiency(s, d)),
    "q_chunking" -> ((s: SparkSession, d: String) => DatasetOps.chunkManifest(s, d)),
    "q_decontam" -> ((s: SparkSession, d: String) => DatasetOps.decontaminate(s, d)),
    "q_mixture" -> (DatasetOps.mixturePlan _),
    // temperature-scaled shares (sampling exponent T=0.7): upweights
    // small sources without hand-set weights
    "q_mixture_temperature" -> ((s: SparkSession, d: String) =>
      DatasetOps.mixtureTemperature(s, d)),
    "q_snapshot_diff" -> ((s: SparkSession, d: String) => Reconcile.snapshotDiff(s, d)),
    // mixed-schema parquet ingestion: two physically drifted epochs
    // (INT32/INT96/narrow-decimal vs INT64/µs/widened + added column)
    // normalized through one loader; oracle recomputes from the
    // original rows, proving the evolved read loses nothing
    "q_schema_drift" -> ((s: SparkSession, d: String) =>
      graft.sources.SchemaDrift.driftSummary(s, d)),
    "q_mixture_sample" -> (DatasetOps.mixtureSample _),
    "q_source_overlap" -> ((s: SparkSession, d: String) => DatasetOps.sourceOverlapMatrix(s, d)),
    // training-run prep: deterministic global shuffle + sharding,
    // vocabulary + id-encoding, rollup-from-partials maintenance
    "q_shard_order" -> ((s: SparkSession, d: String) => TrainingPrep.shardOrder(s, d)),
    "q_vocab_encode" -> ((s: SparkSession, d: String) => TrainingPrep.vocabEncode(s, d)),
    "q_incr_agg" -> (TrainingPrep.weeklyRollup _),
    // rows-only: HLL sketch estimates are engine-specific; SketchSpec
    // asserts the estimate against the exact distinct count
    "q_hll_rollup" -> (TrainingPrep.hllRollup _),
    "q_hll_rollup_exact" -> (TrainingPrep.hllRollupExact _),
    // mergeable-histogram percentile rollup: deterministic arithmetic,
    // so the sketch itself is hash-oracled (unlike the HLL estimate)
    "q_hist_rollup" -> (TrainingPrep.histogramRollup _),
    // summary-table rewrite: query is written against the FACT; the
    // optimizer rule answers it from the registered pre-aggregation
    "q_mv_rewrite" -> (SummaryMv.summarize _),
    // dedup family
    "q_dedup_exact" -> (Dedup.exactGroups _),
    "q_canonical_map" -> (Dedup.canonicalMap _),
    "q_dedup_minhash" -> ((s: SparkSession, d: String) => Dedup.minhashNearDups(s, d)),
    "q_dedup_simhash" -> ((s: SparkSession, d: String) => Dedup.simhashNearDups(s, d)),
    "q_dedup_ngram" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardDups(s, d)),
    // overlap-coefficient containment: the excerpt-inside-longer-page
    // case Jaccard misses (names the smaller doc as the drop candidate)
    "q_dedup_containment" -> ((s: SparkSession, d: String) => Dedup.containmentDups(s, d)),
    "q_dedup_embedding" -> ((s: SparkSession, d: String) => Dedup.embeddingNearDups(s, d, 0.4)),
    // persisted-index variant: same exact result (100% recall holds
    // for any frozen centroid set), training/pruning paid once
    "q_dedup_embedding_indexed" -> ((s: SparkSession, d: String) =>
      Dedup.embeddingNearDupsIndexed(s, d, 0.4)),
    // similarity search
    "q_knn_brute" -> ((s: SparkSession, d: String) => Similarity.knnBruteForce(s, d)),
    // int8 scalar quantization + exact rerank: result is exact (same
    // oracle as brute force), the corpus scan reads 1/4 the bytes
    "q_knn_sq8" -> ((s: SparkSession, d: String) => Similarity.knnSq8(s, d)),
    // contrastive hard negatives: most-similar vectors of a DIFFERENT
    // label, per-query top-k via the bounded-heap aggregator
    "q_hard_negatives" -> ((s: SparkSession, d: String) => Similarity.hardNegatives(s, d)),
    // embedding-space cluster quality: per-label centroid norm +
    // member-to-centroid cosine distribution
    "q_label_centroids" -> ((s: SparkSession, d: String) => Similarity.labelCentroids(s, d)),
    "q_knn_ivf" -> ((s: SparkSession, d: String) => Similarity.knnIvf(s, d)),
    // the 2-iteration-trained grid served from the build-once persisted
    // index (IvfIndex.ensureIndex): training cost is paid per index
    // GENERATION, not per query — identical results to the ad-hoc
    // knnIvf(kmeansIters = 2) form (IvfIndexSpec asserts the parity)
    "q_knn_ivf_kmeans" -> ((s: SparkSession, d: String) =>
      IvfIndex.knnIndexed(s, d, kmeansIters = 2)),
    "q_knn_ivf_indexed" -> ((s: SparkSession, d: String) => IvfIndex.knnIndexed(s, d)),
    // IVF + int8 sidecar + exact rerank: the cheap wide-probe path
    // (rows-only like the other grid-seeded variants; its exact
    // companion is q_knn_brute, and a Round15 spec pins it equal to
    // the plain full-precision nprobe=32 search)
    "q_knn_ivf_sq8" -> ((s: SparkSession, d: String) => IvfIndex.knnSq8Rerank(s, d)),
    // ANN quality as data (rows-only): recall of each approximate
    // variant vs the exact brute-force top-k on the same queries
    "q_ann_recall" -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    // frequency sketch (approximate — accuracy asserted in SketchSpec).
    // Tokens go through InvertedIndex.normalizeToken so the sketch's
    // word universe is the SAME one q_doc_index / the text queries use
    // (raw whitespace tokens would disagree on punctuation-bearing
    // words and make cross-checks against the index impossible)
    "q_heavy_hitters" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions.{col, explode, length, split}
      // an under-split scan (fewer file splits than cores — a handful
      // of big files) would serialize the tokenize + sketch pass; a
      // corpus-sized repartition fixes that, but it's only worth its
      // shuffle when the corpus is big enough for serial tokenize to
      // dominate. Both signals are PURE plan metadata (no job, no
      // physical planning): relation stats for bytes, and the split
      // count the scan WILL get, estimated as bytes /
      // spark.sql.files.maxPartitionBytes — the same arithmetic
      // FilePartition uses (an `.rdd` probe here would force physical
      // planning of the scan just to read a number). At 100 TB the
      // scan arrives pre-split and the branch is a no-op; at test
      // scale (one 0.5 MB file) the shuffle — and the per-partition
      // sketch emission it would multiply — is skipped.
      val docs0 = graft.Tables.load(s, d, "documents").select(col("text"))
      val para = s.sparkContext.defaultParallelism
      val bytes = docs0.queryExecution.optimizedPlan.stats.sizeInBytes
      val maxPart = BigInt(s.sessionState.conf.filesMaxPartitionBytes)
      val estSplits = (bytes + maxPart - 1) / maxPart
      val docs = if (bytes > (64L << 20) && estSplits < para)
        docs0.repartition(para) else docs0
      val toks = docs
        .select(explode(split(col("text"), "\\s+")).as("tok"))
        .select(graft.operators.InvertedIndex.normalizeToken(col("tok")).as("word"))
        .filter(length(col("word")) > 0)
      graft.functions.HeavyHitters.frequentWords(s, toks, "word", minCount = 100)
    }),
    // temporal joins
    "q_asof_join" -> (AsOfJoin.purchasesWithLastClick _),
    "q_range_late" -> (AsOfJoin.lateShipments _),
    // multimodal binary columns
    "q_media_meta" -> (Multimodal.mediaMetaSummary _),
    "q_media_neardups" -> ((s: SparkSession, d: String) => Multimodal.mediaNearDups(s, d)),
    // exact companion: unsampled window-share candidates + integer
    // byte-histogram cosine — fully DuckDB-oracled (the sampled +
    // LSH-banded q_media_neardups stays rows-only by construction)
    "q_media_neardups_exact" -> ((s: SparkSession, d: String) =>
      Multimodal.mediaNearDupsExact(s, d)),
    // LINEAR-OUTPUT group form of the exact media audit: connected
    // components over the same verified near-dup relation, one row per
    // member (group_id = canonical min member) — the pair report is a
    // quadratic encoding of near-clique groups; this is the form that
    // survives a dup-dense corpus (candidates stream un-deduplicated
    // through map-side union-find contraction, never shuffled)
    "q_media_dup_groups" -> ((s: SparkSession, d: String) =>
      Multimodal.mediaDupGroups(s, d)),
    // incremental group maintenance: ingest the below-400 half as
    // generation 0, the rest as generation 1 — delta-headed candidates,
    // appended verified pairs, warm-started closure, and the exact
    // cap-crossing repair make the final labels identical to the
    // one-shot over the full corpus, so it shares the reachability
    // oracle (q_dedup_incremental's lifecycle discipline)
    "q_media_dup_groups_incremental" -> ((s: SparkSession, d: String) =>
      graft.operators.MediaGroupsInc.mediaDupGroupsIncremental(s, d)),
    // group-state takedown: the incremental build, then delete of the
    // media_id % 7 == 3 victims — masked victim pairs, physically
    // rewritten victim postings, negative df partials, and the exact
    // UN-crossing repair (resurrect + fresh-verify) make the surviving
    // labels equal the one-shot over the remaining corpus
    "q_media_dup_groups_takedown" -> ((s: SparkSession, d: String) =>
      graft.operators.MediaGroupsInc.mediaDupGroupsTakedown(s, d)),
    // erasure audit — the compliance query a takedown process ends
    // with: verifyErased over a staged MID-LIFECYCLE state (group
    // state + text index, victims deleted, not yet compacted); the
    // oracle re-counts every claim with DuckDB read_parquet over the
    // same staged files (fixed fixture path — see erasureAuditRoot)
    "q_erasure_audit" -> ((s: SparkSession, d: String) =>
      graft.operators.Takedown.erasureAudit(s, d)),
    // image perceptual near-dup: 56-bit dHash (gradient-sign
    // fingerprint, brightness-invariant) + exact pigeonhole blocking
    // under Hamming <= 3 — both fully oracled (integer pixel sums,
    // comparisons, XOR popcounts)
    "q_image_phash" -> ((s: SparkSession, d: String) =>
      graft.operators.PerceptualHash.imagePhash(s, d)),
    "q_image_neardups" -> ((s: SparkSession, d: String) =>
      graft.operators.PerceptualHash.imageNearDups(s, d)),
    // incremental image lifecycle: build the chunk index on the
    // even-id half, INSERT the odd half, serve the pair set under the
    // query-time df cap — row-identical to q_image_neardups (uncapped
    // stored postings + summed df partials = one-shot chunk-df
    // semantics), so it shares the oracle
    "q_image_neardups_indexed" -> ((s: SparkSession, d: String) =>
      graft.operators.PerceptualHash.imageNearDupsIndexed(s, d)),
    // video excerpt matching: frame-sampled dHash constellation +
    // offset-coherent votes (the audio design on the third modality)
    "q_video_matches" -> ((s: SparkSession, d: String) =>
      graft.operators.PerceptualHash.videoMatches(s, d)),
    // same semantics served from the persisted + incrementally-built
    // frame index (bucket-partitioned postings, query-time frame-df
    // cap, DPP-pruned probe) — row-identical, shares the oracle
    "q_video_matches_indexed" -> ((s: SparkSession, d: String) =>
      graft.operators.PerceptualHash.videoMatchesIndexed(s, d)),
    // second modality: audio landmark fingerprinting (constellation
    // pairs over frame features) and excerpt matching by
    // offset-coherent votes — integer arithmetic, exact oracles
    "q_audio_fingerprint" -> ((s: SparkSession, d: String) =>
      AudioMatch.fingerprint(s, d)),
    "q_audio_match" -> ((s: SparkSession, d: String) =>
      AudioMatch.matchClips(s, d)),
    // same semantics served from the build-once persisted landmark
    // index (key-bucket partitioned, probe prunes via DPP) — row-
    // identical to q_audio_match, so it shares the oracle
    "q_audio_match_indexed" -> ((s: SparkSession, d: String) =>
      AudioMatch.matchClipsIndexed(s, d)),
    // incremental lifecycle: build on half the tracks, INSERT the other
    // half (append-only postings + algebraic df partials; cap applied
    // at query time), probe — row-identical to the full-corpus match
    "q_audio_match_incremental" -> ((s: SparkSession, d: String) =>
      AudioMatch.matchClipsIncremental(s, d)),
    // audio ContentID takedown: build+insert, then tombstone+compact
    // of the media_id % 9 == 4 tracks (MediaIndexOps lifecycle on the
    // landmark layout) — post-compaction postings AND df partials both
    // equal a rebuild over the remaining tracks; clips still probe
    // from the full corpus
    "q_audio_match_takedown" -> ((s: SparkSession, d: String) =>
      AudioMatch.matchClipsTakedown(s, d)),
    // ALL coherent matches above the vote floor (a catalog with
    // duplicate tracks returns every copy, not the tie-break winner)
    "q_audio_match_all" -> ((s: SparkSession, d: String) =>
      AudioMatch.matchClipsAll(s, d)),
    // events / time series
    "q_events_hourly" -> (EventsQueries.hourlyCounts _),
    "q_events_daily" -> (EventsQueries.dailyActivity _),
    "q_events_sessions" -> (EventsQueries.sessionCounts _),
    "q_events_topusers" -> (EventsQueries.topUsers _),
    "q_events_json" -> (EventsQueries.jsonProps _),
    // dyadic freshness decay in BIGINT arithmetic (shift = exact 2^-k
    // weighting, no float summation anywhere) — hash-oracled
    "q_time_decay" -> (EventsQueries.timeDecayedValue _),
    "q_funnel" -> (EventsQueries.funnel _),
    // iterative graph analytics: damped PageRank over the supplier-part
    // co-supply graph, fixed-point BIGINT arithmetic (integer division
    // each update) so 5 synchronous iterations hash-match the unrolled
    // DuckDB CTE chain exactly
    "q_pagerank" -> ((s: SparkSession, d: String) => Graphs.pageRank(s, d)),
    // entity resolution: noun-blocked + length-banded fuzzy part-name
    // linkage, levenshtein-verified (integer distance, exact oracle)
    "q_entity_match" -> ((s: SparkSession, d: String) => EntityResolution.fuzzyParts(s, d)),
    // same operator with the block cap forced low, so every block takes
    // the big-block REPRESENTATIVE-pair branch — oracles the graceful
    // above-cap semantics that sf0.01 data never triggers at the
    // default cap
    "q_entity_match_rep" -> ((s: SparkSession, d: String) =>
      EntityResolution.fuzzyParts(s, d, maxBlock = 50)),
    // union blocking (head noun OR first token): the recall repair for
    // single-key blocking's noun-typo miss; two equi-joins + distinct,
    // never an OR-join nested loop
    "q_entity_match_union" -> ((s: SparkSession, d: String) =>
      EntityResolution.fuzzyNamesUnionBlocked(s, d)),
    // declarative DQ constraint audit: PK uniqueness, FK orphans,
    // range/null predicates — one report row per constraint
    "q_dq_audit" -> (QualityAudit.audit _),
    // join-key skew diagnostic: power-of-two histogram of per-key
    // fan-out for the hot join keys — sizes salting/AQE thresholds
    "q_skew_profile" -> (QualityAudit.skewProfile _),
    // BPE merge training: k argmax-merge rounds over the word-count
    // dictionary (corpus scanned once; iterations are vocab-sized)
    "q_bpe_train" -> ((s: SparkSession, d: String) => Bpe.bpeTrain(s, d)),
    // encode with the trained merges: vocab-sized dictionary resolved
    // to a local relation and broadcast onto one corpus posexplode
    "q_bpe_encode" -> ((s: SparkSession, d: String) => Bpe.bpeEncode(s, d)),
    // open-vocabulary encode: merges trained on the training split
    // only, applied to the whole corpus's distinct words — unseen
    // words char-split and fold through the learned merge chain
    "q_bpe_encode_oov" -> ((s: SparkSession, d: String) => Bpe.bpeEncodeHeldOut(s, d)),
    // embedding-space decontamination: eval set broadcast, train side
    // one narrow scan; catches paraphrased leaks n-gram overlap misses
    "q_decontam_semantic" -> ((s: SparkSession, d: String) =>
      DatasetOps.semanticDecontam(s, d)),
    "q_retention" -> (EventsQueries.retention _),
    "q_histogram" -> ((s: SparkSession, d: String) => EventsQueries.valueHistogram(s, d)),
    // transitive near-dup groups (pairs -> connected components)
    "q_dedup_groups" -> ((s: SparkSession, d: String) => Dedup.minhashDupGroups(s, d)),
    // BM25 ranked retrieval (tf saturation + length normalization)
    "q_bm25" -> ((s: SparkSession, d: String) => TextQueries.bm25Search(s, d)),
    // lexical+semantic reciprocal-rank fusion over the two legs above:
    // ranks (not scores) cross lists, so the fused output is
    // engine-portable and fully oracle-checkable
    "q_hybrid_rrf" -> ((s: SparkSession, d: String) => HybridSearch.rrfFusion(s, d)),
    // second retrieval stage: cross-encoder-style pair rerank of the
    // fused candidates (term proximity + occurrence, integer scoring);
    // the expensive scorer sees only the k fused docs, never the corpus
    "q_hybrid_rerank" -> ((s: SparkSession, d: String) => HybridSearch.ceRerank(s, d)),
    // PII scrub stage (emails → IPv4 → digit runs, in that order);
    // the md5 fingerprint makes the oracle compare full redacted text
    "q_pii_redact" -> (Redaction.redactDocuments _),
    // copy-on-write keyed MERGE on a hash-bucketed snapshot: apply a
    // deterministic upsert/delete/insert batch through the
    // partition-pruned path, then fingerprint the on-disk result —
    // the oracle reproduces the merge relationally
    "q_upsert" -> (Upsert.upsertOrders _),
    // file-level data skipping from an external per-file stats table
    // (the manifest/zone-map play): the answer comes from reading ONLY
    // the files whose min/max envelope intersects the range
    "q_zonemap" -> (ZoneMap.zonemapDocuments _),
    // transitive dup groups over EXACT ngram-Jaccard pairs — the CC
    // closure itself is oracle-verified via a recursive-CTE
    // reachability query (unlike q_dedup_groups whose minhash pair
    // stage is engine-hash-specific)
    "q_dedup_groups_exact" -> ((s: SparkSession, d: String) => Dedup.ngramDupGroups(s, d)),
    // keep/drop policy over the exact near-dup groups: most-complete
    // member (max tokens, ties to min id) as the group representative
    "q_dedup_keep_best" -> ((s: SparkSession, d: String) =>
      Dedup.dupGroupKeepBest(s, d)),
    // dup-cluster size distribution (curation dashboard stat)
    "q_dedup_group_sizes" -> ((s: SparkSession, d: String) => Dedup.dupGroupSizes(s, d)),
    // exact-size balanced class downsampling by portable hash rank
    "q_stratified" -> (DatasetOps.stratifiedSample _),
    // SCD-2 state-validity intervals (gaps-and-islands)
    "q_scd2" -> (EventsQueries.scd2States _),
    // Tukey-fence outlier screen (order-statistic fences: counts are
    // bit-deterministic cross-engine, unlike z-score boundaries)
    "q_events_outliers" -> (EventsQueries.valueOutliers _),
    // calendar densification: every hour in the span, zero-count
    // hours included (generated hour dimension + left join)
    "q_events_gapfill" -> (EventsQueries.hourlyRateGapFilled _),
    // next-event-prediction training pairs from per-user event history
    "q_seq_examples" -> ((s: SparkSession, d: String) => EventsQueries.seqExamples(s, d)),
    // data layout / profiling
    "q_zorder" -> (Layout.zOrderEvents _),
    "q_zorder_prune" -> (Layout.zOrderPruneReport _),
    "q_compaction_plan" -> ((s: SparkSession, d: String) => Layout.compactionPlan(s, d)),
    "q_profile" -> ((s: SparkSession, d: String) => Profile.profileDocuments(s, d)),
    // data-selection scoring: exact unigram-LM surprisal (perplexity
    // proxy) and DSIR-style hashed-bucket importance weights
    "q_surprisal" -> ((s: SparkSession, d: String) => Selection.surprisal(s, d)),
    // bigram-LM cross-entropy (CCNet/KenLM-shaped perplexity scoring):
    // catches improbable word ORDER that unigram surprisal can't see
    "q_bigram_lm" -> ((s: SparkSession, d: String) => Selection.bigramCrossEntropy(s, d)),
    "q_dsir_weights" -> ((s: SparkSession, d: String) => Selection.dsirWeights(s, d)),
    // SemDeDup-style keep/drop decision layer over the exact cosine
    // near-dup pair graph (greedy min-id canonicalization)
    "q_semantic_keep" -> ((s: SparkSession, d: String) => Selection.semanticKeep(s, d)),
    // delta-vs-corpus dedup: batch (doc_id >= 400) deduped against the
    // persisted existing-corpus shingle index + earlier batch docs
    "q_dedup_incremental" -> ((s: SparkSession, d: String) =>
      Dedup.incrementalNgramDedup(s, d)),
    // GDPR erasure for the text-dedup state: the existing-corpus
    // shingle store in the deletable (doc-bucketed) layout, victims
    // (doc_id % 7 == 2, id < 400) tombstoned + compacted, then the
    // standard batch probe — decisions equal a full recompute with
    // the victims absent (df cap recomputed from live postings)
    "q_dedup_incremental_takedown" -> ((s: SparkSession, d: String) =>
      Dedup.incrementalNgramDedupTakedown(s, d)),
    // GDPR erasure for the persisted letter-partitioned inverted
    // index: materialize, IndexStore.delete the doc_id % 11 == 5
    // victims (touched-letter pruned rewrite), serve the q_doc_index
    // shape from the stored postings
    "q_doc_index_takedown" -> (TextQueries.docIndexTakedown _),
  )

  /** Shared DuckDB CTE: whitespace-tokenize documents, strip
    * non-alpha, lowercase, drop empties — mirrors
    * InvertedIndex.normalizeToken exactly.
    */
  private val wordsCte =
    """WITH raw AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
      |), toks AS (
      |  SELECT doc_id, lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS word FROM raw
      |), words AS (
      |  SELECT DISTINCT doc_id, word FROM toks WHERE length(word) > 0
      |)""".stripMargin

  private val docToksCte =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents
      |)""".stripMargin

  /** Shared DuckDB CTE chain mirroring Curation.decisions. */
  private val curationSql =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
      |  FROM documents
      |), s1 AS (
      |  SELECT doc_id, text, toks,
      |   CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is'], lower(x)))) AS BIGINT) AS score_en,
      |   CAST(len(list_filter(toks, x -> list_contains(['der','und','die','das'], lower(x)))) AS BIGINT) AS score_de,
      |   CAST(len(list_filter(toks, x -> list_contains(['el','y','los','las'], lower(x)))) AS BIGINT) AS score_es,
      |   CAST(len(list_filter(toks, x -> list_contains(['le','et','les','des'], lower(x)))) AS BIGINT) AS score_fr
      |  FROM d
      |), sig AS (
      |  SELECT doc_id,
      |   CAST(len(toks) AS BIGINT) AS n_tokens,
      |   floor(CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
      |     / greatest(length(text), 1) * 10000 + 0.5) / 10000 AS punct_ratio,
      |   CASE WHEN greatest(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
      |    WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
      |    WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
      |    WHEN score_es >= score_fr THEN 'es'
      |    ELSE 'fr' END AS pred_lang,
      |   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM s1
      |), canon AS (
      |  SELECT *, min(doc_id) OVER (PARTITION BY fp) AS canonical_id FROM sig
      |), dec AS (
      |  SELECT doc_id, n_tokens, punct_ratio, pred_lang, canonical_id,
      |   CAST(CASE WHEN n_tokens < 20 OR n_tokens > 100000 OR punct_ratio > 0.2
      |     THEN 1 ELSE 0 END AS BIGINT) AS fail_quality,
      |   CAST(CASE WHEN pred_lang != 'en' THEN 1 ELSE 0 END AS BIGINT) AS fail_lang,
      |   CAST(CASE WHEN doc_id != canonical_id THEN 1 ELSE 0 END AS BIGINT) AS fail_dup,
      |   CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 100000 AND punct_ratio <= 0.2
      |     AND pred_lang = 'en' AND doc_id = canonical_id
      |     THEN 1 ELSE 0 END AS BIGINT) AS keep
      |  FROM canon
      |)""".stripMargin

  /** Transitive closure over the verified media near-dup relation: the
    * recursive-CTE reachability restatement (the q_dedup_groups_exact
    * discipline) — group label = min reachable node, exactly
    * Dedup.connectedComponents' semantics, one row per member. Shared
    * by the one-shot and the incremental lifecycle (which converges to
    * identical labels — delta-headed emission is complete under
    * growing dfs, and the cap-crossing repair removes exactly the
    * over-emissions). */
  private val mediaDupGroupsOracle: String = mediaDupGroupsOracleOver("documents")

  /** The same reachability closure over a restricted document source —
    * the takedown lifecycle's oracle pushes the victim predicate into
    * the source, because post-delete labels equal the one-shot over
    * the remaining corpus (the delete-exactness contract). */
  private val mediaDupGroupsTakedownOracle: String =
    mediaDupGroupsOracleOver("(SELECT * FROM documents WHERE doc_id % 7 <> 3)")

  private def mediaDupGroupsOracleOver(src: String): String =
    s"""WITH RECURSIVE w AS (
      | SELECT DISTINCT d.doc_id AS media_id,
      |  substring(d.text, CAST(t.p AS INT), 16) AS win
      | FROM $src d,
      |  UNNEST(range(1, GREATEST(length(d.text) - 15, 1) + 1, 4)) AS t(p)),
      |keepw AS (
      | SELECT win FROM (SELECT win, count(*) AS w_df FROM w GROUP BY 1)
      | WHERE w_df >= 2 AND w_df <= 64),
      |ws AS (SELECT w.* FROM w JOIN keepw USING (win)),
      |cand AS (
      | SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
      | FROM ws a JOIN ws b ON a.win = b.win AND a.media_id < b.media_id),
      |h AS (
      | SELECT d.doc_id AS media_id,
      |  (ord(substring(d.text, CAST(t.i AS INT), 1)) // 4) AS bin,
      |  CAST(count(*) AS BIGINT) AS cnt
      | FROM $src d, UNNEST(range(1, length(d.text) + 1, 1)) AS t(i)
      | GROUP BY 1, 2),
      |n AS (SELECT media_id, SUM(cnt * cnt) AS n2 FROM h GROUP BY 1),
      |dots AS (
      | SELECT c.media_a, c.media_b, SUM(ha.cnt * hb.cnt) AS dot
      | FROM cand c
      | JOIN h ha ON ha.media_id = c.media_a
      | JOIN h hb ON hb.media_id = c.media_b AND hb.bin = ha.bin
      | GROUP BY 1, 2),
      |edges AS (
      | SELECT d.media_a, d.media_b
      | FROM dots d
      | JOIN n na ON na.media_id = d.media_a
      | JOIN n nb ON nb.media_id = d.media_b
      | WHERE CAST(d.dot AS DOUBLE)
      |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.99),
      |sym AS (SELECT media_a AS a, media_b AS b FROM edges
      |  UNION SELECT media_b, media_a FROM edges),
      |reach(node, r) AS (
      | SELECT a, a FROM (SELECT DISTINCT a FROM sym) base
      | UNION
      | SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a)
      |SELECT node AS media_id, min(r) AS group_id
      |FROM reach GROUP BY node ORDER BY media_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_quantity), 2) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_quantity > 49 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_star_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_topk_segment" ->
      """SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
        | round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,
    // the heap-UDAF variant must be byte-identical to the window form —
    // one oracle text, two physical plans
    "q_topk_heap" ->
      """SELECT c_mktsegment, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
        | round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,
    "q_anti_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_big_spenders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_setops_custkeys" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q_setops_all" ->
      """SELECT o_custkey, count(*) AS multiplicity FROM (
        | ((SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |   UNION ALL
        |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        | INTERSECT ALL
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_left_join" ->
      """SELECT c_mktsegment,
        | count(o_orderkey) AS n_big_orders,
        | count(*) AS n_rows,
        | count(DISTINCT c_custkey) AS n_customers,
        | CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_big
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        | ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_full_outer" ->
      """WITH cal AS (SELECT CAST(unnest(range(1994, 1998)) AS BIGINT) AS cal_yr),
        | o AS (
        | SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_yr,
        |  count(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT coalesce(cal_yr, o_yr) AS yr,
        | CAST(CASE WHEN cal_yr IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_calendar,
        | coalesce(n_orders, 0) AS n_orders
        |FROM cal FULL JOIN o ON cal_yr = o_yr
        |ORDER BY yr""".stripMargin,
    "q_order_stats" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | count(DISTINCT o_custkey) AS n_customers,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price,
        | round(sum(o_totalprice), 2) / count(*) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT
        | CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END AS region,
        | CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "q_cube_orders" ->
      """SELECT
        | CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
        | CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT
        | CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
        | CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
        | count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
        |FROM supplier s
        |WHERE s_acctbal > (SELECT CAST(sum(CAST(s2.s_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |                          / count(*)
        |                   FROM supplier s2
        |                   WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s_suppkey""".stripMargin,
    "q_exists_subquery" ->
      """SELECT p_brand, count(*) AS n_parts
        |FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_partkey = p.p_partkey AND l.l_returnflag = 'R'
        |                    AND l.l_quantity >= 49)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        | CAST(ntile(4) OVER w AS BIGINT) AS balance_quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM customer WHERE c_custkey <= 300
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name,
        | string_agg(c_name, ',' ORDER BY c_name) AS names,
        | count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey % 100 = 0
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_unpivot" ->
      """WITH p AS (
        | SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
        | FROM orders GROUP BY 1)
        |SELECT o_year, status, total FROM (
        | SELECT o_year, 'O' AS status, total_o AS total FROM p
        | UNION ALL SELECT o_year, 'F', total_f FROM p
        | UNION ALL SELECT o_year, 'P', total_p FROM p)
        |WHERE total IS NOT NULL
        |ORDER BY o_year, status""".stripMargin,
    "q_conditional_agg" ->
      """SELECT o_orderstatus,
        | count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        | bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
        | bool_and(o_totalprice > 1000) AS all_above_1k,
        | round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent_total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        | floor(stddev_samp(l_quantity) * 10000 + 0.5) / 10000 AS sd_qty,
        | floor(var_samp(l_quantity) * 10000 + 0.5) / 10000 AS var_qty,
        | floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000 AS corr_qty_price,
        | floor(covar_samp(l_quantity, l_discount) * 10000 + 0.5) / 10000 AS covar_qty_disc
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderkey, o_custkey,
        | count(*) OVER w AS n_trailing,
        | floor(sum(o_totalprice) OVER w * 10000 + 0.5) / 10000 AS sum_trailing
        |FROM (SELECT *, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS days
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY days
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_nav_windows" ->
      """SELECT o_orderkey, o_custkey,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        | nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_regex_funcs" ->
      """SELECT p_partkey,
        | CAST(NULLIF(regexp_extract(p_brand, '#([0-9]+)', 1), '') AS BIGINT) AS brand_num,
        | regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        | regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked,
        | CAST(len(regexp_split_to_array(p_name, ' ')) AS BIGINT) AS n_name_words
        |FROM part
        |WHERE regexp_matches(p_name, '(ring|bolt|widget)$')
        |ORDER BY p_partkey""".stripMargin,
    "q_bigram_freq" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> lower(regexp_replace(t, '[^A-Za-z]+', '', 'g'))),
        |   w -> len(w) > 0) AS ws
        | FROM documents
        |), b AS (
        | SELECT ws[i] || ' ' || ws[i + 1] AS bigram
        | FROM d, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        | WHERE len(ws) >= 2
        |)
        |SELECT bigram, count(*) AS n FROM b
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "q_pmi" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '\s+'),
        |    t -> lower(regexp_replace(t, '[^A-Za-z]+', '', 'g'))),
        |   w -> len(w) > 0) AS ws
        | FROM documents),
        | u AS (SELECT w AS word, count(*) AS c
        |  FROM d, unnest(ws) AS t(w) GROUP BY 1),
        | tu AS (SELECT sum(c) AS nu FROM u),
        | b AS (SELECT ws[i] AS w1, ws[i + 1] AS w2, count(*) AS c_ab
        |  FROM d, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |  WHERE len(ws) >= 2 GROUP BY 1, 2),
        | tb AS (SELECT sum(CAST(len(ws) - 1 AS BIGINT)) AS nb FROM d WHERE len(ws) >= 2)
        |SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b,
        | floor((ln(((CAST(c_ab AS DOUBLE) * nu) * nu) /
        |            ((CAST(ua.c AS DOUBLE) * ub.c) * nb)) / ln(2.0)) * 10000 + 0.5)
        |   / 10000 AS pmi
        |FROM b JOIN u ua ON b.w1 = ua.word JOIN u ub ON b.w2 = ub.word, tu, tb
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, w1, w2""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderstatus,
        | floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5) / 10000 AS median_price,
        | floor(quantile_cont(o_totalprice, 0.9) * 10000 + 0.5) / 10000 AS p90_price,
        | floor(quantile_cont(o_totalprice, 0.99) * 10000 + 0.5) / 10000 AS p99_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey,
        | upper(c_name) AS name_upper,
        | substr(c_name, 1, 8) AS name_prefix,
        | CAST(length(c_name) AS BIGINT) AS name_len,
        | concat_ws('/', c_mktsegment, c_name) AS seg_name,
        | CAST(levenshtein(c_name, 'Customer') AS BIGINT) AS edit_dist
        |FROM customer WHERE c_name LIKE '%1%'
        |ORDER BY c_custkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        | CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
        | CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS o_day,
        | CAST(o_orderdate AS DATE) + 30 AS due_date,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS quarter_later,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_above_avg" ->
      """SELECT o_orderkey, o_custkey FROM (
        | SELECT o_orderkey, o_custkey, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2)
        |    / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
        | FROM orders)
        |WHERE o_totalprice > cust_avg * 1.1
        |ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        | round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
        | round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_minmax_by" ->
      """SELECT o_orderstatus,
        | arg_max(o_orderkey, printf('%020.4f#%010d', o_totalprice, o_orderkey)) AS priciest_order,
        | arg_min(o_orderkey, printf('%020.4f#%010d', o_totalprice, o_orderkey)) AS cheapest_order
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_running" ->
      """SELECT o_orderkey, o_custkey,
        | floor(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 + 0.5) / 10000
        |   AS running_total,
        | lag(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey) AS prev_price,
        | CAST(dense_rank() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC) AS BIGINT) AS price_rank
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_doc_index" -> (wordsCte +
      """
        |SELECT word,
        | string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS doc_ids,
        | count(*) AS n_docs
        |FROM words GROUP BY word ORDER BY n_docs DESC, word""".stripMargin),
    "q_doc_posting" -> (wordsCte +
      """
        |SELECT word,
        | string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS doc_ids,
        | count(*) AS n_docs
        |FROM words WHERE word IN ('spark', 'join', 'window', 'stream')
        |GROUP BY word ORDER BY word""".stripMargin),
    "q_doc_topk_letter" -> (wordsCte +
      """, idx AS (
        | SELECT word, count(*) AS n_docs, substr(word, 1, 1) AS letter
        | FROM words GROUP BY word)
        |SELECT letter, CAST(rnk AS BIGINT) AS rnk, word, n_docs
        |FROM (SELECT letter, word, n_docs,
        |  row_number() OVER (PARTITION BY letter ORDER BY n_docs DESC, word) AS rnk
        | FROM idx)
        |WHERE rnk <= 5 ORDER BY letter, rnk""".stripMargin),
    "q_doc_bool" -> (wordsCte +
      """, flags AS (
        | SELECT doc_id,
        |  CAST(max(CASE WHEN word = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS has_spark,
        |  CAST(max(CASE WHEN word = 'join' THEN 1 ELSE 0 END) AS BIGINT) AS has_join,
        |  CAST(max(CASE WHEN word = 'stream' THEN 1 ELSE 0 END) AS BIGINT) AS has_stream,
        |  CAST(max(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS has_window
        | FROM words WHERE word IN ('spark', 'join', 'stream', 'window')
        | GROUP BY doc_id)
        |SELECT doc_id, has_spark, has_join, has_stream FROM flags
        |WHERE ((has_spark = 1 AND has_join = 1) OR has_stream = 1) AND has_window = 0
        |ORDER BY doc_id""".stripMargin),
    "q_corpus_stats" -> (wordsCte +
      """, t AS (
        | SELECT count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> len(x) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        | FROM documents),
        | w AS (
        | SELECT count(DISTINCT word) AS n_distinct_words, count(*) AS n_postings
        | FROM words)
        |SELECT n_docs, n_tokens, n_chars, n_distinct_words, n_postings FROM t, w""".stripMargin),
    "q_text_quality" -> (docToksCte +
      """
        |SELECT doc_id,
        | CAST(length(text) AS BIGINT) AS len_chars,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subwords,
        | floor(CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS DOUBLE)
        |   / greatest(len(toks), 1) * 10000 + 0.5) / 10000 AS avg_token_len,
        | floor(CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |   / greatest(length(text), 1) * 10000 + 0.5) / 10000 AS punct_ratio,
        | floor(CAST(len(list_filter(toks, x -> list_contains(
        |     ['the','a','an','of','and','in','to','is','it','for'], lower(x)))) AS DOUBLE)
        |   / greatest(len(toks), 1) * 10000 + 0.5) / 10000 AS stopword_ratio
        |FROM d ORDER BY doc_id""".stripMargin),
    "q_lang_id" -> (docToksCte +
      """, s AS (
        | SELECT doc_id,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','and','of','is'], lower(x)))) AS BIGINT) AS score_en,
        |  CAST(len(list_filter(toks, x -> list_contains(['der','und','die','das'], lower(x)))) AS BIGINT) AS score_de,
        |  CAST(len(list_filter(toks, x -> list_contains(['el','y','los','las'], lower(x)))) AS BIGINT) AS score_es,
        |  CAST(len(list_filter(toks, x -> list_contains(['le','et','les','des'], lower(x)))) AS BIGINT) AS score_fr
        | FROM d)
        |SELECT doc_id, score_en, score_de, score_es, score_fr,
        | CASE WHEN greatest(score_en, score_de, score_es, score_fr) = 0 THEN 'und'
        |  WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
        |  WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
        |  WHEN score_es >= score_fr THEN 'es'
        |  ELSE 'fr' END AS predicted_lang
        |FROM s ORDER BY doc_id""".stripMargin),
    "q_tfidf" ->
      ("""WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
        |), q AS (
        |  SELECT doc_id, lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS word FROM raw
        |)""".stripMargin +
      """, qf AS (
        | SELECT doc_id, word FROM q
        | WHERE word IN ('spark', 'join', 'window')
        |), tf AS (SELECT doc_id, word, count(*) AS tf FROM qf GROUP BY 1, 2),
        | df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
        | nn AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id,
        | floor(sum(tf * ln(CAST(n AS DOUBLE) / df)) * 10000 + 0.5) / 10000 AS score,
        | count(*) AS n_terms
        |FROM tf JOIN df USING (word) CROSS JOIN nn
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin),
    "q_phrase" ->
      """WITH raw AS (
        | SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents
        |), pos AS (
        | SELECT doc_id, i - 1 AS pos,
        |  lower(regexp_replace(toks[i], '[^A-Za-z]+', '', 'g')) AS word
        | FROM raw, unnest(generate_series(1, len(toks))) AS t(i)
        |), p0 AS (SELECT doc_id, pos FROM pos WHERE word = 'the'),
        | p1 AS (SELECT doc_id, pos FROM pos WHERE word = 'table')
        |SELECT p0.doc_id, count(*) AS n_occurrences
        |FROM p0 JOIN p1 ON p0.doc_id = p1.doc_id AND p1.pos = p0.pos + 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_curation" -> (curationSql +
      """
        |SELECT doc_id, n_tokens, punct_ratio, pred_lang, canonical_id,
        | fail_quality, fail_lang, fail_dup, keep
        |FROM dec ORDER BY doc_id""".stripMargin),
    "q_curation_funnel" -> (curationSql +
      """
        |SELECT count(*) AS n_docs,
        | CAST(sum(fail_quality) AS BIGINT) AS n_fail_quality,
        | CAST(sum(fail_lang) AS BIGINT) AS n_fail_lang,
        | CAST(sum(fail_dup) AS BIGINT) AS n_fail_dup,
        | CAST(sum(keep) AS BIGINT) AS n_kept
        |FROM dec""".stripMargin),
    "q_train_split" ->
      """WITH a AS (
        | SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |   ELSE 'test' END AS split,
        |  lang,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS n_tokens,
        |  n_chars
        | FROM documents)
        |SELECT split, lang, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_seq_packing" ->
      """WITH t AS (
        | SELECT doc_id, lang, doc_id % 8 AS shard,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS n_tokens
        | FROM documents),
        | c AS (
        | SELECT doc_id, lang, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t)
        |SELECT lang, shard,
        | CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT) AS bin_id,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_pack_efficiency" ->
      """WITH t AS (
        | SELECT doc_id, lang, doc_id % 8 AS shard,
        |  len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS n_tokens
        | FROM documents),
        | c AS (
        | SELECT doc_id, lang, shard, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t),
        | bins AS (
        | SELECT lang, shard,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT) AS bin_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        | FROM c GROUP BY 1, 2, 3)
        |SELECT lang, count(*) AS n_bins,
        | CAST(sum(n_docs) AS BIGINT) AS n_docs,
        | CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
        | floor(CAST(sum(bin_tokens) AS DOUBLE) / (count(*) * 512) * 10000 + 0.5) / 10000 AS avg_fill,
        | CAST(sum(CASE WHEN bin_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_overfull
        |FROM bins GROUP BY 1 ORDER BY lang""".stripMargin,
    "q_chunking" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        | FROM documents),
        | c AS (
        | SELECT doc_id, n_tokens, unnest(range(0, n_tokens, 96)) AS start_tok
        | FROM t WHERE n_tokens > 0)
        |SELECT doc_id, CAST(start_tok / 96 AS BIGINT) AS chunk_id, start_tok,
        | CAST(least(128, n_tokens - start_tok) AS BIGINT) AS chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_schema_drift" ->
      graft.sources.SchemaDrift.driftSummaryOracleSql,
    "q_snapshot_diff" ->
      """WITH a AS (
        | SELECT (event_id % 1000003) * (2654435761 % 1000003) % 1000003 AS h
        | FROM events),
        | b AS (
        | SELECT (event_id % 1000003) * (2654435761 % 1000003) % 1000003 AS h
        | FROM events WHERE event_id % 97 != 13),
        | ca AS (SELECT h % 64 AS bucket, count(*) AS n_a, sum(h) AS sum_a
        |  FROM a GROUP BY 1),
        | cb AS (SELECT h % 64 AS bucket, count(*) AS n_b, sum(h) AS sum_b
        |  FROM b GROUP BY 1)
        |SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
        | COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
        | CAST(COALESCE(sum_a, 0) AS BIGINT) AS sum_a,
        | CAST(COALESCE(sum_b, 0) AS BIGINT) AS sum_b,
        | CASE WHEN COALESCE(n_a, 0) != COALESCE(n_b, 0) THEN 'count_diff'
        |      WHEN COALESCE(sum_a, 0) != COALESCE(sum_b, 0) THEN 'checksum_diff'
        |      ELSE 'match' END AS status
        |FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
        |ORDER BY bucket""".stripMargin,
    "q_mixture" ->
      """WITH per AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0))) AS BIGINT) AS src_tokens
        | FROM documents GROUP BY 1),
        | per2 AS (
        | SELECT per.*, CAST(1 + (CAST(substr(source, 4) AS INT) % 3) AS DOUBLE) AS w_raw FROM per),
        | tot AS (SELECT sum(w_raw) AS sum_w FROM per2),
        | w AS (
        | SELECT per2.*, w_raw / sum_w AS wgt,
        |  CAST(src_tokens AS DOUBLE) / (w_raw / sum_w) AS ratio
        | FROM per2, tot),
        | b AS (SELECT min(ratio) AS budget FROM w),
        | r AS (
        | SELECT w.*, wgt * budget / CAST(src_tokens AS DOUBLE) AS rate_raw FROM w, b)
        |SELECT source, n_docs, src_tokens,
        | floor(wgt * 10000 + 0.5) / 10000 AS weight,
        | floor(rate_raw * 10000 + 0.5) / 10000 AS sample_rate,
        | CAST(floor(rate_raw * CAST(src_tokens AS DOUBLE)) AS BIGINT) AS expected_tokens
        |FROM r ORDER BY source""".stripMargin,
    "q_mixture_temperature" ->
      """WITH per AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0))) AS BIGINT) AS src_tokens
        | FROM documents GROUP BY 1),
        | tot AS (SELECT sum(src_tokens) AS total FROM per),
        | sh AS (
        | SELECT per.*, CAST(src_tokens AS DOUBLE) / total AS p,
        |  pow(CAST(src_tokens AS DOUBLE) / total, 0.7) AS pt
        | FROM per, tot),
        | zz AS (SELECT sum(pt) AS z FROM sh)
        |SELECT source, n_docs, src_tokens,
        | floor(p * 10000 + 0.5) / 10000 AS natural_share,
        | floor(pt / z * 10000 + 0.5) / 10000 AS temp_share,
        | floor((pt / z) / p * 10000 + 0.5) / 10000 AS boost
        |FROM sh, zz ORDER BY source""".stripMargin,
    "q_decontam" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        | FROM toks WHERE len(t) >= 3),
        | grams AS (
        | SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram FROM idx),
        | eval_g AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(*) AS n_shared_ngrams
        |FROM grams JOIN eval_g USING (gram)
        |WHERE doc_id % 97 != 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH t AS (
        | SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS tok
        | FROM documents),
        | c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY 1, 2),
        | a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |   CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(n) AS BIGINT) AS max_n,
        |   list_reduce(list_transform(list(n ORDER BY n), x -> x * log2(x)),
        |     (acc, x) -> acc + x) AS nlogn
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        | floor((1 - CAST(n_distinct AS DOUBLE) / n_tokens) * 10000 + 0.5) / 10000 AS rep_ratio,
        | floor((CAST(max_n AS DOUBLE) / n_tokens) * 10000 + 0.5) / 10000 AS max_tok_frac,
        | floor((log2(CAST(n_tokens AS DOUBLE)) - nlogn / n_tokens) * 10000 + 0.5) / 10000 AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_percentile_exact" ->
      """SELECT o_orderstatus, count(*) AS n,
        | floor(quantile_cont(o_totalprice, 0.25) * 10000 + 0.5) / 10000 AS p25,
        | floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5) / 10000 AS p50,
        | floor(quantile_cont(o_totalprice, 0.75) * 10000 + 0.5) / 10000 AS p75,
        | floor(quantile_cont(o_totalprice, 0.9) * 10000 + 0.5) / 10000 AS p90
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_heavy_hitters_exact" ->
      """WITH raw AS (
        | SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents),
        | toks AS (
        | SELECT lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS value FROM raw)
        |SELECT value, count(*) AS n FROM toks WHERE length(value) > 0
        |GROUP BY value ORDER BY n DESC, value LIMIT 50""".stripMargin,
    "q_index_diff" ->
      """WITH raw AS (
        | SELECT doc_id, source, unnest(regexp_split_to_array(text, '\s+')) AS tok
        | FROM documents),
        | toks AS (
        | SELECT doc_id, source,
        |  lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS word FROM raw),
        | words AS (
        | SELECT DISTINCT doc_id, source, word FROM toks WHERE length(word) > 0),
        | newdf AS (SELECT word, count(*) AS df FROM words GROUP BY 1),
        | olddf AS (SELECT word, count(*) AS df FROM words
        |  WHERE source != 'src0' GROUP BY 1),
        | j AS (
        | SELECT coalesce(n.word, o.word) AS word,
        |  coalesce(o.df, 0) AS df_old, coalesce(n.df, 0) AS df_new
        | FROM newdf n FULL OUTER JOIN olddf o ON n.word = o.word)
        |SELECT word, df_old, df_new,
        | CASE WHEN df_old = 0 THEN 'added' WHEN df_new = 0 THEN 'removed'
        |  ELSE 'changed' END AS status
        |FROM j WHERE df_old != df_new ORDER BY word""".stripMargin,
    // varint length is a pure function of the zigzag value's magnitude
    // (ceil(bits/7)), so the oracle reproduces the codec's exact byte
    // count with integer comparisons — no varint implementation needed
    "q_posting_compression" -> (wordsCte +
      """, g AS (
        | SELECT word, doc_id,
        |  doc_id - lag(doc_id) OVER (PARTITION BY word ORDER BY doc_id) AS gap
        | FROM words),
        | v AS (SELECT word, 2 * CAST(coalesce(gap, doc_id) AS HUGEINT) AS z FROM g),
        | l AS (SELECT word, count(*) AS n, sum(CASE
        |   WHEN z < 128 THEN 1 WHEN z < 16384 THEN 2 WHEN z < 2097152 THEN 3
        |   WHEN z < 268435456 THEN 4 WHEN z < 34359738368 THEN 5
        |   WHEN z < 4398046511104 THEN 6 WHEN z < 562949953421312 THEN 7
        |   WHEN z < 72057594037927936 THEN 8
        |   WHEN z < 9223372036854775808 THEN 9 ELSE 10 END) AS enc
        |  FROM v GROUP BY word)
        |SELECT substr(word, 1, 1) AS letter, count(*) AS n_words,
        | CAST(sum(n) AS BIGINT) AS n_postings,
        | CAST(sum(n) * 8 AS BIGINT) AS raw_bytes,
        | CAST(sum(enc) AS BIGINT) AS enc_bytes,
        | count(*) AS n_roundtrip_ok,
        | floor(CAST(sum(n) * 8 AS DOUBLE) / sum(enc) * 10000 + 0.5) / 10000 AS ratio
        |FROM l GROUP BY letter ORDER BY letter""".stripMargin),
    "q_domain_cap" ->
      """WITH ranked AS (
        | SELECT source, doc_id, n_chars,
        |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source_docs,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
        | FROM documents)
        |SELECT source, n_source_docs, rnk, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM ranked WHERE rnk <= 15 ORDER BY source, rnk""".stripMargin,
    "q_boilerplate" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '\s+'),
        |    x -> lower(regexp_replace(x, '[^A-Za-z]+', '', 'g'))), w -> len(w) > 0) AS ws
        | FROM documents),
        | g0 AS (SELECT doc_id, ws, unnest(range(len(ws) - 1)) AS p FROM d WHERE len(ws) >= 2),
        | g AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
        |   ws[CAST(p AS INT) + 1] || ' ' || ws[CAST(p AS INT) + 2] AS gram FROM g0),
        | bp AS (SELECT gram FROM (
        |   SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
        |   ORDER BY df DESC, gram LIMIT 50)),
        | cov1 AS (SELECT DISTINCT doc_id, o FROM (
        |   SELECT g.doc_id, unnest([g.p, g.p + 1]) AS o FROM g JOIN bp USING (gram))),
        | cov AS (SELECT doc_id, count(*) AS n_covered FROM cov1 GROUP BY doc_id),
        | n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM d)
        |SELECT n.doc_id, n.n_tokens,
        | CAST(coalesce(cov.n_covered, 0) AS BIGINT) AS n_covered,
        | CASE WHEN n.n_tokens = 0 THEN 0.0
        |  ELSE floor(CAST(coalesce(cov.n_covered, 0) AS DOUBLE) / n.n_tokens * 10000 + 0.5) / 10000
        | END AS boiler_frac
        |FROM n LEFT JOIN cov USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "q_repeated_spans" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '\s+'),
        |    x -> lower(regexp_replace(x, '[^A-Za-z]+', '', 'g'))), w -> len(w) > 0) AS ws
        | FROM documents),
        | g0 AS (SELECT doc_id, ws, unnest(range(len(ws) - 7)) AS p FROM d WHERE len(ws) >= 8),
        | g AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
        |   array_to_string(ws[CAST(p AS INT) + 1 : CAST(p AS INT) + 8], ' ') AS gram FROM g0),
        | rep AS (SELECT gram FROM (
        |   SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2),
        | cov1 AS (SELECT DISTINCT doc_id, o FROM (
        |   SELECT g.doc_id, unnest(range(g.p, g.p + 8)) AS o FROM g JOIN rep USING (gram))),
        | cov AS (SELECT doc_id, count(*) AS n_covered FROM cov1 GROUP BY doc_id),
        | n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM d)
        |SELECT n.doc_id, n.n_tokens,
        | CAST(coalesce(cov.n_covered, 0) AS BIGINT) AS n_covered,
        | CASE WHEN n.n_tokens = 0 THEN 0.0
        |  ELSE floor(CAST(coalesce(cov.n_covered, 0) AS DOUBLE) / n.n_tokens * 10000 + 0.5) / 10000
        | END AS rep_frac
        |FROM n LEFT JOIN cov USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "q_boilerplate_strip" ->
      """WITH d AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '\s+'),
        |    x -> lower(regexp_replace(x, '[^A-Za-z]+', '', 'g'))), w -> len(w) > 0) AS ws
        | FROM documents),
        | g0 AS (SELECT doc_id, ws, unnest(range(len(ws) - 1)) AS p FROM d WHERE len(ws) >= 2),
        | g AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
        |   ws[CAST(p AS INT) + 1] || ' ' || ws[CAST(p AS INT) + 2] AS gram FROM g0),
        | bp AS (SELECT gram FROM (
        |   SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram
        |   ORDER BY df DESC, gram LIMIT 50)),
        | cov1 AS (SELECT DISTINCT doc_id, o FROM (
        |   SELECT g.doc_id, unnest([g.p, g.p + 1]) AS o FROM g JOIN bp USING (gram))),
        | tok0 AS (SELECT doc_id, ws, unnest(range(len(ws))) AS i FROM d),
        | tok AS (SELECT doc_id, CAST(i AS BIGINT) AS i, ws[CAST(i AS INT) + 1] AS w FROM tok0),
        | kept AS (
        |   SELECT t.doc_id, t.i, t.w FROM tok t
        |   LEFT JOIN cov1 c ON t.doc_id = c.doc_id AND t.i = c.o
        |   WHERE c.doc_id IS NULL),
        | agg AS (
        |   SELECT doc_id, count(*) AS n_kept,
        |    string_agg(w, ' ' ORDER BY i) AS txt
        |   FROM kept GROUP BY doc_id),
        | n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM d)
        |SELECT n.doc_id, n.n_tokens,
        | CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        | md5(coalesce(a.txt, '')) AS clean_fp
        |FROM n LEFT JOIN agg a USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "q_mixture_sample" ->
      """WITH per AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0))) AS BIGINT) AS src_tokens
        | FROM documents GROUP BY 1),
        | per2 AS (
        | SELECT per.*, CAST(1 + (CAST(substr(source, 4) AS INT) % 3) AS DOUBLE) AS w_raw FROM per),
        | tot AS (SELECT sum(w_raw) AS sum_w FROM per2),
        | w AS (
        | SELECT per2.*, w_raw / sum_w AS wgt,
        |  CAST(src_tokens AS DOUBLE) / (w_raw / sum_w) AS ratio
        | FROM per2, tot),
        | b AS (SELECT min(ratio) AS budget FROM w),
        | r AS (
        | SELECT source, floor(wgt * budget / CAST(src_tokens AS DOUBLE) * 10000 + 0.5) / 10000 AS sample_rate
        | FROM w, b),
        | samp AS (
        | SELECT d.source, r.sample_rate,
        |  CASE WHEN CAST(((d.doc_id % 1000003) * 427799) % 1000003 AS DOUBLE) / 1000003 < r.sample_rate
        |       THEN 1 ELSE 0 END AS keep
        | FROM documents d JOIN r USING (source))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(keep) AS BIGINT) AS n_sampled,
        | max(sample_rate) AS target_rate,
        | floor(CAST(sum(keep) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS achieved_rate
        |FROM samp GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_source_overlap" ->
      """WITH t AS (
        | SELECT source,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | i AS (SELECT source, t, unnest(range(1, len(t) - 1)) AS i FROM t WHERE len(t) >= 3),
        | g AS (SELECT DISTINCT source, concat_ws(' ', t[i], t[i+1], t[i+2]) AS gram FROM i)
        |SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared_grams
        |FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // multiplicative-congruential hash in plain BIGINT arithmetic:
    // bit-identical in both engines, no engine hash builtin involved
    "q_shard_order" ->
      """WITH h AS (
        | SELECT doc_id,
        |  (doc_id * 2654435761 + 1013904223) % 2147483648 AS h
        | FROM documents)
        |SELECT h % 8 AS shard_id,
        | CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS position,
        | doc_id, h
        |FROM h ORDER BY shard_id, position""".stripMargin,
    "q_vocab_encode" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS ts
        | FROM documents),
        | vocab AS (
        | SELECT tok AS token,
        |  CAST(row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS BIGINT) AS token_id
        | FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY tok
        | QUALIFY token_id <= 256),
        | ex AS (
        | SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
        |  unnest(ts[1:12]) AS tok,
        |  unnest(range(least(len(ts), 12))) AS pos
        | FROM toks WHERE len(ts) > 0)
        |SELECT ex.doc_id, ex.n_tokens,
        | string_agg(CAST(coalesce(v.token_id, 0) AS VARCHAR), ' ' ORDER BY ex.pos) AS token_ids
        |FROM ex LEFT JOIN vocab v ON ex.tok = v.token
        |GROUP BY ex.doc_id, ex.n_tokens
        |ORDER BY ex.doc_id""".stripMargin,
    // exact companion of the (rows-only) sketch rollup: hash-verified
    // weekly distinct counts the estimate can be judged against
    "q_hll_rollup_exact" ->
      """SELECT CAST(weekofyear(CAST(ts AS DATE)) AS BIGINT) AS week, event_type,
        | count(*) AS n_events,
        | count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin,
    // the histogram-sketch rollup is deterministic arithmetic, so the
    // oracle recomputes the SAME merged-partial walk — a hash-checked
    // sketch row (the HLL sibling can only ever be rows-only)
    "q_hist_rollup" ->
      """WITH daily AS (
        | SELECT CAST(ts AS DATE) AS event_date, event_type,
        |  CAST(least(127, greatest(0, floor(value / 5.0))) AS BIGINT) AS bucket,
        |  count(*) AS cnt
        | FROM events GROUP BY 1, 2, 3),
        | weekly AS (
        | SELECT CAST(weekofyear(event_date) AS BIGINT) AS week, event_type, bucket,
        |  CAST(sum(cnt) AS BIGINT) AS cnt
        | FROM daily GROUP BY 1, 2, 3),
        | c AS (
        | SELECT *, coalesce(sum(cnt) OVER (PARTITION BY week, event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
        |  sum(cnt) OVER (PARTITION BY week, event_type) AS total
        | FROM weekly)
        |SELECT week, event_type, CAST(max(total) AS BIGINT) AS n_events,
        | max(CASE WHEN cum_before < 0.5 * total AND 0.5 * total <= cum_before + cnt
        |  THEN floor((bucket * 5.0 + 5.0 * (0.5 * total - cum_before) / cnt) * 10000 + 0.5) / 10000 END) AS h_p50,
        | max(CASE WHEN cum_before < 0.9 * total AND 0.9 * total <= cum_before + cnt
        |  THEN floor((bucket * 5.0 + 5.0 * (0.9 * total - cum_before) / cnt) * 10000 + 0.5) / 10000 END) AS h_p90,
        | max(CASE WHEN cum_before < 0.99 * total AND 0.99 * total <= cum_before + cnt
        |  THEN floor((bucket * 5.0 + 5.0 * (0.99 * total - cum_before) / cnt) * 10000 + 0.5) / 10000 END) AS h_p99
        |FROM c GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin,
    // oracle recomputes the weekly stats DIRECTLY from raw events; the
    // engine answers from daily algebraic partials — equality proves
    // the partial-merge (rollup maintenance) is exact
    "q_incr_agg" ->
      """SELECT CAST(weekofyear(CAST(ts AS DATE)) AS BIGINT) AS week, event_type,
        | count(*) AS n_events,
        | round(sum(value), 2) AS sum_value,
        | min(value) AS min_value,
        | max(value) AS max_value,
        | floor(round(sum(value), 2) / count(*) * 10000 + 0.5) / 10000 AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY week, event_type""".stripMargin,
    // oracle aggregates RAW lineitem; the engine's plan reads the
    // registered summary table — equality proves the rewrite invisible
    "q_mv_rewrite" ->
      """SELECT l_returnflag,
        | count(*) AS n_rows,
        | sum(l_quantity) AS sum_qty,
        | min(l_quantity) AS min_qty,
        | max(l_quantity) AS max_qty,
        | avg(l_quantity) AS avg_qty
        |FROM lineitem WHERE l_returnflag != 'X'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        | min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    "q_canonical_map" ->
      """WITH f AS (
        | SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        | FROM documents)
        |SELECT doc_id,
        | min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
        | CAST(CASE WHEN doc_id != min(doc_id) OVER (PARTITION BY fp)
        |   THEN 1 ELSE 0 END AS BIGINT) AS is_duplicate
        |FROM f ORDER BY doc_id""".stripMargin,
    // exact mirror of Dedup.ngramJaccardDups (k=2, maxDf=50, t=0.3)
    // over STRING shingles: hash-Jaccard ≡ string-Jaccard because
    // whitespace-split tokens contain no spaces (concat_ws ' ' is
    // injective on token pairs) and xxhash64 collisions are 2^-64
    "q_dedup_ngram" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b,
        |  floor(CAST(inter AS DOUBLE) / (na.cnt + nb.cnt - inter) * 10000 + 0.5) / 10000
        |    AS jaccard
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM scored
        |WHERE jaccard >= 0.3 ORDER BY 1, 2""".stripMargin,
    "q_dedup_containment" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b, na.cnt AS na, nb.cnt AS nb,
        |  floor(CAST(inter AS DOUBLE) / least(na.cnt, nb.cnt) * 10000 + 0.5) / 10000
        |    AS overlap
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id)
        |SELECT doc_a, doc_b,
        | CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained_doc, overlap
        |FROM scored WHERE overlap >= 0.5 ORDER BY 1, 2""".stripMargin,
    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5) / 10000 AS cos
        |FROM e a, e b
        |WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.emb, b.emb) >= 0.4
        |ORDER BY 1, 2""".stripMargin,
    // indexed variant is exact by construction — same oracle
    "q_dedup_embedding_indexed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        | floor(list_cosine_similarity(a.emb, b.emb) * 10000 + 0.5) / 10000 AS cos
        |FROM e a, e b
        |WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.emb, b.emb) >= 0.4
        |ORDER BY 1, 2""".stripMargin,
    "q_knn_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10),
        | s AS (SELECT query_id, vec_id,
        |   floor(list_cosine_similarity(emb, q_emb) * 10000 + 0.5) / 10000 AS cos
        |  FROM e, q WHERE vec_id != query_id),
        | r AS (SELECT query_id, vec_id, cos,
        |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM s)
        |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor_id, cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    // SQ8+rerank is exact by construction — same oracle as brute force
    "q_knn_sq8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 10),
        | s AS (SELECT query_id, vec_id,
        |   floor(list_cosine_similarity(emb, q_emb) * 10000 + 0.5) / 10000 AS cos
        |  FROM e, q WHERE vec_id != query_id),
        | r AS (SELECT query_id, vec_id, cos,
        |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM s)
        |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor_id, cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
        | q AS (SELECT vec_id AS query_id, emb AS q_emb, label AS q_label
        |  FROM e WHERE vec_id < 10),
        | s AS (SELECT query_id, q_label, vec_id,
        |   floor(list_cosine_similarity(emb, q_emb) * 10000 + 0.5) / 10000 AS cos
        |  FROM e, q WHERE vec_id != query_id AND e.label != q_label),
        | r AS (SELECT query_id, q_label, vec_id, cos,
        |   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM s)
        |SELECT query_id, q_label, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor_id, cos
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "q_label_centroids" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | x AS (SELECT label, unnest(emb) AS v, generate_subscripts(emb, 1) AS i FROM e),
        | c AS (SELECT label, i, sum(v) / count(*) AS m FROM x GROUP BY 1, 2),
        | cent AS (SELECT label, list(m ORDER BY i) AS cm FROM c GROUP BY 1),
        | cn AS (SELECT label, cm, sqrt(list_inner_product(cm, cm)) AS c_nrm FROM cent),
        | s AS (SELECT e.label,
        |   floor(list_cosine_similarity(e.emb, cn.cm) * 10000 + 0.5) / 10000 AS cos,
        |   cn.c_nrm
        |  FROM e JOIN cn USING (label))
        |SELECT label, count(*) AS n_vectors,
        | floor(max(c_nrm) * 10000 + 0.5) / 10000 AS centroid_norm,
        | floor(sum(cos) / count(*) * 10000 + 0.5) / 10000 AS avg_cos,
        | min(cos) AS min_cos, max(cos) AS max_cos
        |FROM s GROUP BY label ORDER BY label""".stripMargin,
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value AS purchase_value,
        | c.value AS last_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY 1, 2) c
        | ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_range_late" ->
      """SELECT o_orderstatus, count(*) AS n_late_lines,
        | count(DISTINCT o_orderkey) AS n_late_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_media_meta" ->
      """WITH m AS (
        | SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |   ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        | FROM documents)
        |SELECT media_id, kind, n_bytes,
        | CASE WHEN n_bytes = 0 THEN 0 ELSE CAST(ceil(CAST(n_bytes AS DOUBLE)
        |   / ceil(CAST(n_bytes AS DOUBLE) / 4)) AS BIGINT) END AS n_frames,
        | n_bytes AS frame_bytes
        |FROM m ORDER BY media_id""".stripMargin,
    "q_image_phash" -> graft.operators.PerceptualHash.imagePhashOracleSql,
    "q_image_neardups" -> graft.operators.PerceptualHash.imageNearDupsOracleSql,
    // the incremental chunk-index lifecycle is row-identical by the
    // uncapped-storage + query-time-cap design
    "q_image_neardups_indexed" ->
      graft.operators.PerceptualHash.imageNearDupsOracleSql,
    "q_video_matches" -> graft.operators.PerceptualHash.videoMatchesOracleSql,
    // persisted/incremental frame index: row-identical by construction
    "q_video_matches_indexed" ->
      graft.operators.PerceptualHash.videoMatchesOracleSql,
    // the gate corpus is pure ASCII (verified), so the oracle restates
    // the BYTE-level window/histogram ops on VARCHAR: code point ==
    // byte, length == octet_length. The Spark side stays byte-exact on
    // arbitrary binary.
    "q_media_neardups_exact" ->
      """WITH w AS (
        | SELECT DISTINCT d.doc_id AS media_id,
        |  substring(d.text, CAST(t.p AS INT), 16) AS win
        | FROM documents d,
        |  UNNEST(range(1, GREATEST(length(d.text) - 15, 1) + 1, 4)) AS t(p)),
        |keepw AS (
        | SELECT win FROM (SELECT win, count(*) AS w_df FROM w GROUP BY 1)
        | WHERE w_df >= 2 AND w_df <= 64),
        |ws AS (SELECT w.* FROM w JOIN keepw USING (win)),
        |cand AS (
        | SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
        | FROM ws a JOIN ws b ON a.win = b.win AND a.media_id < b.media_id),
        |h AS (
        | SELECT d.doc_id AS media_id,
        |  (ord(substring(d.text, CAST(t.i AS INT), 1)) // 4) AS bin,
        |  CAST(count(*) AS BIGINT) AS cnt
        | FROM documents d, UNNEST(range(1, length(d.text) + 1, 1)) AS t(i)
        | GROUP BY 1, 2),
        |n AS (SELECT media_id, SUM(cnt * cnt) AS n2 FROM h GROUP BY 1),
        |dots AS (
        | SELECT c.media_a, c.media_b, SUM(ha.cnt * hb.cnt) AS dot
        | FROM cand c
        | JOIN h ha ON ha.media_id = c.media_a
        | JOIN h hb ON hb.media_id = c.media_b AND hb.bin = ha.bin
        | GROUP BY 1, 2)
        |SELECT d.media_a, d.media_b,
        | floor(CAST(d.dot AS DOUBLE)
        |   / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |   * 10000 + 0.5) / 10000 AS cos
        |FROM dots d
        |JOIN n na ON na.media_id = d.media_a
        |JOIN n nb ON nb.media_id = d.media_b
        |WHERE CAST(d.dot AS DOUBLE)
        |   / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.99
        |ORDER BY 1, 2""".stripMargin,
    // transitive closure over the SAME verified pair relation: the
    // recursive-CTE reachability restatement (the q_dedup_groups_exact
    // discipline) — group label = min reachable node, exactly
    // Dedup.connectedComponents' semantics, one row per member
    "q_media_dup_groups" -> mediaDupGroupsOracle,
    // the incremental lifecycle converges to the identical labels
    // (delta-headed emission is complete under growing dfs; the
    // cap-crossing repair removes exactly the over-emissions), so the
    // same reachability closure oracles it
    "q_media_dup_groups_incremental" -> mediaDupGroupsOracle,
    // the takedown converges to the one-shot over the remaining corpus
    // (un-crossing repair restores exactly the suppressed pairs), so
    // the same closure oracles it with the victims predicate pushed
    // into the document source
    "q_media_dup_groups_takedown" -> mediaDupGroupsTakedownOracle,
    // the audit fixture is staged at a FIXED path derived from the
    // driver's verify dir (the sf0.01 testdata contract — `entry`
    // pins the same root), so the independent DuckDB reader can glob
    // the very files the audit made claims about
    "q_erasure_audit" ->
      graft.operators.Takedown.erasureAuditOracleSql("/root/testdata/sf0.01"),
    // audio landmark family: integer frame energies + constellation
    // keys + offset-coherent votes — byte values via ord() over the
    // ASCII payload text, same convention as q_media_neardups_exact
    "q_audio_fingerprint" ->
      graft.operators.AudioMatch.fingerprintOracleSql,
    "q_audio_match" ->
      graft.operators.AudioMatch.matchClipsOracleSql,
    // the persisted-index variant is row-identical by construction
    "q_audio_match_indexed" ->
      graft.operators.AudioMatch.matchClipsOracleSql,
    // the incremental build+insert lifecycle is row-identical too:
    // uncapped stored postings + query-time cap over summed df partials
    // = exactly the full-corpus df semantics
    "q_audio_match_incremental" ->
      graft.operators.AudioMatch.matchClipsOracleSql,
    // the takedown compaction reconciles postings AND df partials to
    // the rebuild state, so the oracle is the same match SQL with the
    // victims removed from the index side only (clips unchanged)
    "q_audio_match_takedown" ->
      graft.operators.AudioMatch.matchClipsTakedownOracleSql,
    "q_audio_match_all" ->
      graft.operators.AudioMatch.matchClipsAllOracleSql,
    "q_events_hourly" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        | CAST(EXTRACT(hour FROM ts) AS BIGINT) AS event_hour,
        | event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_events_daily" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        | count(*) AS n_events, count(DISTINCT user_id) AS n_users,
        | round(sum(value), 2) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH x AS (
        | SELECT user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        | FROM events),
        | y AS (
        | SELECT user_id,
        |  CASE WHEN prev_ts IS NULL THEN 0
        |   WHEN date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_break
        | FROM x)
        |SELECT user_id, CAST(sum(is_break) + 1 AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM y GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_events_topusers" ->
      """WITH t AS (
        | SELECT event_type, user_id, round(sum(value), 2) AS total_value
        | FROM events GROUP BY 1, 2),
        | r AS (
        | SELECT event_type, user_id, total_value,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY total_value DESC, user_id) AS rnk
        | FROM t)
        |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id, total_value
        |FROM r WHERE rnk <= 5 ORDER BY event_type, rnk""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        | count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_time_decay" -> graft.operators.EventsQueries.timeDecayedValueOracleSql,
    "q_pagerank" -> graft.operators.Graphs.pageRankOracleSql(),
    "q_entity_match" -> graft.operators.EntityResolution.fuzzyPartsOracleSql(),
    "q_entity_match_rep" ->
      graft.operators.EntityResolution.fuzzyPartsOracleSql(maxBlock = 50),
    "q_entity_match_union" ->
      graft.operators.EntityResolution.fuzzyNamesUnionBlockedOracleSql(),
    "q_dq_audit" -> graft.operators.QualityAudit.auditOracleSql,
    "q_skew_profile" -> graft.operators.QualityAudit.skewProfileOracleSql,
    "q_bpe_train" -> graft.operators.Bpe.bpeTrainOracleSql(),
    "q_bpe_encode" -> graft.operators.Bpe.bpeEncodeOracleSql(),
    "q_bpe_encode_oov" -> graft.operators.Bpe.bpeEncodeHeldOutOracleSql(),
    "q_decontam_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |ev AS (SELECT * FROM e WHERE vec_id % 97 = 0),
        |tr AS (SELECT * FROM e WHERE vec_id % 97 <> 0)
        |SELECT t.vec_id,
        | CAST(count(*) AS BIGINT) AS n_contaminating,
        | floor(max(list_cosine_similarity(t.emb, v.emb)) * 10000 + 0.5) / 10000 AS max_cos
        |FROM tr t JOIN ev v ON list_cosine_similarity(t.emb, v.emb) >= 0.4
        |GROUP BY t.vec_id ORDER BY t.vec_id""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT * FROM (
        | SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
        |  count(DISTINCT user_id) AS n_users FROM v
        | UNION ALL SELECT 2, 'click_after_view', count(DISTINCT user_id) FROM c
        | UNION ALL SELECT 3, 'purchase_after_click', count(DISTINCT user_id) FROM p)
        |ORDER BY stage""".stripMargin,
    "q_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events)
        |SELECT cohort_date,
        | date_diff('day', cohort_date, active_date) AS day_offset,
        | count(*) AS n_users
        |FROM a JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
        | CAST(floor(value / 25) * 25 AS DOUBLE) AS bin_lo,
        | count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_zorder" -> (zSpreadCte + """
        |SELECT event_id, x, y, a | (b << 1) AS zval FROM s5
        |ORDER BY event_id""".stripMargin),
    "q_zorder_prune" -> (zSpreadCte + """,
        | z AS (SELECT event_id, x, y, a | (b << 1) AS zval FROM s5),
        | bk AS (SELECT x, y, CAST(ntile(64) OVER (ORDER BY zval, event_id) AS BIGINT) AS bucket FROM z)
        |SELECT bucket, count(*) AS n_rows,
        | min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max,
        | CAST(CASE WHEN min(x) <= 9 AND max(x) >= 3
        |   AND min(y) <= 1705276800 AND max(y) >= 1704844800
        |  THEN 1 ELSE 0 END AS BIGINT) AS hits_box
        |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin),
    "q_compaction_plan" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS bytes_est,
        | CAST(ceil(CAST(sum(n_chars) AS DOUBLE) / 65536) AS BIGINT) AS n_files
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_profile" -> Seq("doc_id", "lang", "n_chars", "source").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         | count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_val,
         | CAST(max($c) AS VARCHAR) AS max_val FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // BM25: same literal-by-literal arithmetic as the Spark side
    // ((1.2 + 1.0), (1.0 - 0.75) — IEEE doubles agree across engines)
    "q_bm25" ->
      """WITH raw AS (
        | SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
        |), t AS (
        | SELECT doc_id, lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS word FROM raw
        |), tt AS (
        | SELECT doc_id, word FROM t WHERE length(word) > 0
        |), dl AS (
        | SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tt GROUP BY 1
        |), stats AS (
        | SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
        |  (SELECT CAST(count(*) AS DOUBLE) FROM tt)
        |    / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
        |), tf AS (
        | SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf FROM tt
        | WHERE word IN ('spark', 'join', 'window') GROUP BY 1, 2
        |), df AS (
        | SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1
        |)
        |SELECT doc_id,
        | floor(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |   * tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
        |   * 10000 + 0.5) / 10000 AS score,
        | count(*) AS n_terms
        |FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // RRF fusion: bm25 leg (same CTEs as q_bm25, top-20 RANKED) +
    // cosine leg (q_knn_brute's rounded-cosine pattern against doc 0's
    // embedding), fused on ranks only. 1.0 is CAST to DOUBLE in the
    // reciprocal — DuckDB parses bare 1.0 as DECIMAL and decimal
    // division would diverge from Spark's double arithmetic.
    "q_hybrid_rrf" ->
      s"""WITH $hybridFusedCte
        |SELECT doc_id, rrf, t_rnk, v_rnk FROM fused
        |ORDER BY rrf DESC, doc_id""".stripMargin,
    // cross-encoder-style pair rerank of the fused top-10: integer
    // proximity evidence (distinct query-term pairs within 8 raw-token
    // positions, weight 10) + query-term occurrence count. Positions
    // come from the parallel-unnest zip (the bpe-oracle trick), 0-based
    // to match Spark's posexplode.
    "q_hybrid_rerank" ->
      s"""WITH $hybridFusedCte, cdocs AS (
        | SELECT d.doc_id, regexp_split_to_array(d.text, '\\s+') AS ws
        | FROM documents d JOIN fused f ON f.doc_id = d.doc_id
        |), chits AS (
        | SELECT doc_id, word, pos FROM (
        |  SELECT doc_id, lower(regexp_replace(w, '[^A-Za-z]+', '', 'g')) AS word,
        |         CAST(p AS BIGINT) AS pos
        |  FROM (SELECT doc_id, unnest(ws) AS w, unnest(range(len(ws))) AS p FROM cdocs))
        | WHERE word IN ('spark', 'join', 'window')
        |), ctf AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM chits GROUP BY 1
        |), cprox AS (
        | SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_prox
        | FROM chits a JOIN chits b ON a.doc_id = b.doc_id AND a.word < b.word
        |   AND abs(a.pos - b.pos) <= 8
        | GROUP BY 1
        |)
        |SELECT doc_id, rrf, ce_score,
        |       CAST(row_number() OVER (ORDER BY ce_score DESC, doc_id) AS BIGINT) AS rank
        |FROM (
        | SELECT f.doc_id, f.rrf,
        |        CAST(COALESCE(p.n_prox, 0) * 10 + COALESCE(t.n_hits, 0) AS BIGINT) AS ce_score
        | FROM fused f LEFT JOIN ctf t USING (doc_id) LEFT JOIN cprox p USING (doc_id))
        |ORDER BY rank""".stripMargin,
    // same RE2-safe patterns, same replacement order; DuckDB needs the
    // explicit 'g' flag (its regexp_replace is first-match by default,
    // Spark's is global)
    "q_pii_redact" ->
      """WITH r AS (
        | SELECT doc_id, text,
        |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        | FROM documents
        |), r2 AS (
        | SELECT doc_id, text, t1,
        |  regexp_replace(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t2
        | FROM r
        |)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ipv4,
        | CAST(len(regexp_extract_all(t2, '[0-9][0-9 ()+-]{6,}[0-9]')) AS INT) AS n_digit_runs,
        | md5(regexp_replace(t2, '[0-9][0-9 ()+-]{6,}[0-9]', '<NUM>', 'g')) AS redacted_md5
        |FROM r2 ORDER BY doc_id""".stripMargin,
    // relational restatement of the copy-on-write merge: base minus
    // rewritten/deleted keys, plus updates and shifted-key inserts —
    // must equal what Upsert actually wrote through the
    // partition-pruned dynamic-overwrite path
    "q_upsert" ->
      """WITH base AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |), updates AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice
        | FROM base WHERE o_orderkey % 97 = 0
        |), deletes AS (
        | SELECT o_orderkey FROM base WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
        |), inserts AS (
        | SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |  'N' AS o_orderstatus, o_totalprice
        | FROM base WHERE o_orderkey % 101 = 0
        |), merged AS (
        | SELECT * FROM base
        | WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        |   AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        | UNION ALL SELECT * FROM updates
        | UNION ALL SELECT * FROM inserts
        |)
        |SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        | round(sum(o_totalprice), 2) AS price_sum
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the zone-map path must answer a range scan identically to the
    // plain relational filter — skipping may drop FILES, never rows
    "q_zonemap" ->
      """SELECT doc_id, source, lang, CAST(length(text) AS INT) AS n_chars
        |FROM documents WHERE doc_id BETWEEN 100 AND 160
        |ORDER BY doc_id""".stripMargin,
    // connected components over the exact ngram-Jaccard pairs: the
    // closure is reachability, expressed as a recursive CTE (UNION =
    // set semantics, so the fixpoint terminates); group label = min
    // reachable node, exactly Dedup.connectedComponents' semantics
    "q_dedup_groups_exact" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na.cnt + nb.cnt - inter) AS jacc
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id),
        | edges AS (
        | SELECT doc_a, doc_b FROM scored
        | WHERE floor(jacc * 10000 + 0.5) / 10000 >= 0.3),
        | sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
        |   UNION SELECT doc_b, doc_a FROM edges),
        | reach(node, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) base
        |  UNION
        |  SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        | labels AS (SELECT node, min(r) AS group_id FROM reach GROUP BY node)
        |SELECT group_id, CAST(count(*) AS BIGINT) AS n_members,
        | max(node) AS max_doc_id
        |FROM labels GROUP BY 1 ORDER BY 1""".stripMargin,
    // same transitive closure, plus the keep/drop policy layer: the
    // most-complete member (max whitespace tokens, ties to min id)
    "q_dedup_keep_best" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na.cnt + nb.cnt - inter) AS jacc
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id),
        | edges AS (
        | SELECT doc_a, doc_b FROM scored
        | WHERE floor(jacc * 10000 + 0.5) / 10000 >= 0.3),
        | sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
        |   UNION SELECT doc_b, doc_a FROM edges),
        | reach(node, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) base
        |  UNION
        |  SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        | labels AS (SELECT node, min(r) AS group_id FROM reach GROUP BY node),
        | q AS (SELECT doc_id,
        |   CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |     x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        | ranked AS (
        | SELECT l.group_id, l.node, q.n_tokens,
        |  row_number() OVER (PARTITION BY l.group_id
        |    ORDER BY q.n_tokens DESC, l.node ASC) AS rn
        | FROM labels l JOIN q ON q.doc_id = l.node),
        | g AS (SELECT group_id, CAST(count(*) AS BIGINT) AS n_members
        |   FROM labels GROUP BY 1)
        |SELECT g.group_id, g.n_members, r.node AS keep_id,
        | r.n_tokens AS keep_tokens
        |FROM g JOIN ranked r ON r.group_id = g.group_id AND r.rn = 1
        |ORDER BY g.group_id""".stripMargin,
    // same transitive closure, rolled up to the size distribution
    "q_dedup_group_sizes" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b,
        |  CAST(inter AS DOUBLE) / (na.cnt + nb.cnt - inter) AS jacc
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id),
        | edges AS (
        | SELECT doc_a, doc_b FROM scored
        | WHERE floor(jacc * 10000 + 0.5) / 10000 >= 0.3),
        | sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
        |   UNION SELECT doc_b, doc_a FROM edges),
        | reach(node, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM sym) base
        |  UNION
        |  SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        | labels AS (SELECT node, min(r) AS group_id FROM reach GROUP BY node),
        | groups AS (SELECT group_id, CAST(count(*) AS BIGINT) AS n_members
        |  FROM labels GROUP BY 1)
        |SELECT n_members, CAST(count(*) AS BIGINT) AS n_groups,
        | CAST(sum(n_members) AS BIGINT) AS n_docs
        |FROM groups GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stratified" ->
      """WITH ranked AS (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |   ORDER BY ((doc_id % 1000003) * (2654435761 % 1000003)) % 1000003, doc_id) AS rn
        | FROM documents
        |), m AS (
        | SELECT min(cnt) AS m
        | FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang) c
        |)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN rn <= m THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        | CAST(sum(CASE WHEN rn <= m THEN doc_id ELSE 0 END) AS BIGINT) AS sampled_sum
        |FROM ranked CROSS JOIN m
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_scd2" ->
      """WITH lagd AS (
        | SELECT user_id, event_id, ts, event_type,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), runs AS (
        | SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id FROM lagd
        |), iv AS (
        | SELECT user_id, run_id, min(ts) AS from_ts, max(event_type) AS state,
        |  count(*) AS n_events
        | FROM runs GROUP BY 1, 2
        |)
        |SELECT user_id, run_id, state, n_events,
        | CAST(epoch_ms(from_ts) AS BIGINT) AS valid_from,
        | CAST(epoch_ms(lead(from_ts) OVER (PARTITION BY user_id
        |   ORDER BY from_ts, run_id)) AS BIGINT) AS valid_to
        |FROM iv ORDER BY user_id, run_id""".stripMargin,
    "q_events_gapfill" ->
      """WITH counts AS (
        | SELECT date_trunc('hour', ts) AS h, count(*) AS n_events
        | FROM events GROUP BY 1),
        | span AS (
        | SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        | FROM events),
        | hours AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span)
        |SELECT CAST(hours.h AS DATE) AS event_date,
        | CAST(hour(hours.h) AS BIGINT) AS event_hour,
        | CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
        |FROM hours LEFT JOIN counts c ON hours.h = c.h
        |ORDER BY event_date, event_hour""".stripMargin,
    "q_events_outliers" ->
      """WITH f AS (
        | SELECT event_type, count(*) AS n,
        |  quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        | FROM events GROUP BY 1),
        | f2 AS (SELECT *, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi FROM f)
        |SELECT e.event_type, max(f2.n) AS n,
        | floor(max(f2.q1) * 10000 + 0.5) / 10000 AS q1,
        | floor(max(f2.q3) * 10000 + 0.5) / 10000 AS q3,
        | floor(max(f2.lo) * 10000 + 0.5) / 10000 AS lo_fence,
        | floor(max(f2.hi) * 10000 + 0.5) / 10000 AS hi_fence,
        | CAST(sum(CASE WHEN e.value < f2.lo OR e.value > f2.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        | floor(max(CASE WHEN e.value > f2.hi THEN e.value END) * 10000 + 0.5) / 10000 AS max_outlier
        |FROM events e JOIN f2 USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // next-event training pairs: context skips leading nulls via
    // concat_ws (both engines drop NULL args by the same rule)
    "q_seq_examples" ->
      """WITH o AS (
        | SELECT user_id, event_type,
        |  CAST(row_number() OVER w AS BIGINT) AS pos,
        |  lag(event_type, 3) OVER w AS l3,
        |  lag(event_type, 2) OVER w AS l2,
        |  lag(event_type, 1) OVER w AS l1
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, pos, concat_ws(' ', l3, l2, l1) AS context,
        | event_type AS target
        |FROM o WHERE pos >= 2 ORDER BY user_id, pos""".stripMargin,
    // data-selection scoring — same lowercased-whitespace token stream
    // as the vocabulary/encode family (empties dropped, no alpha strip)
    "q_surprisal" ->
      """WITH raw AS (
        | SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        | FROM documents),
        | t AS (SELECT doc_id, tok FROM raw WHERE len(tok) > 0),
        | tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        | c AS (SELECT tok, count(*) AS n FROM t GROUP BY 1),
        | tot AS (SELECT count(*) AS total FROM t)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        | floor(sum(tf * -ln(CAST(n AS DOUBLE) / total)) / sum(tf) * 10000 + 0.5)
        |   / 10000 AS surprisal
        |FROM tf JOIN c USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bigram_lm" ->
      """WITH w AS (
        | SELECT doc_id, list_filter(
        |   regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS ws
        | FROM documents),
        | bgr AS (
        | SELECT doc_id, z[1] AS a, z[2] AS b
        | FROM (SELECT doc_id, unnest(list_zip(ws, ws[2:])) AS z FROM w)
        | WHERE z[2] IS NOT NULL),
        | tf AS (SELECT doc_id, a, b, count(*) AS tf FROM bgr GROUP BY 1, 2, 3),
        | bn AS (SELECT a, b, sum(tf) AS bn FROM tf GROUP BY 1, 2),
        | un AS (SELECT a, sum(bn) AS un FROM bn GROUP BY 1),
        | v AS (SELECT count(DISTINCT b) AS v FROM bn)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
        | floor(sum(tf.tf * -(ln((bn.bn + 0.5) / (un.un + 0.5 * v.v)) / ln(2.0)))
        |   / sum(tf.tf) * 10000 + 0.5) / 10000 AS cross_entropy
        |FROM tf JOIN bn USING (a, b) JOIN un USING (a) CROSS JOIN v
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,
    "q_dsir_weights" ->
      """WITH raw AS (
        | SELECT doc_id, lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        | FROM documents),
        | t AS (SELECT doc_id, lang, substr(md5(tok), 1, 2) AS b FROM raw WHERE len(tok) > 0),
        | r AS (SELECT b, count(*) AS cr FROM t GROUP BY 1),
        | g AS (SELECT b, count(*) AS ct FROM t WHERE lang = 'en' GROUP BY 1),
        | tots AS (SELECT (SELECT sum(cr) FROM r) AS tot_r, (SELECT sum(ct) FROM g) AS tot_t),
        | w AS (
        | SELECT r.b,
        |  ln(CAST(coalesce(g.ct, 0) + 1 AS DOUBLE) / (tot_t + 256))
        |   - ln(CAST(r.cr + 1 AS DOUBLE) / (tot_r + 256)) AS w
        | FROM r LEFT JOIN g ON r.b = g.b CROSS JOIN tots)
        |SELECT doc_id, lang, count(*) AS n_tokens,
        | floor(sum(w) * 10000 + 0.5) / 10000 AS log_weight
        |FROM t JOIN w USING (b)
        |GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,
    // keep/drop over the exact cosine pair graph: same all-pairs
    // oracle as q_dedup_embedding, reduced to the min-lower-neighbor
    "q_semantic_keep" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        | p AS (
        | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM e a, e b
        | WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.emb, b.emb) >= 0.4),
        | d AS (SELECT vec_b AS vec_id, min(vec_a) AS dup_min FROM p GROUP BY 1)
        |SELECT e.vec_id,
        | CAST(CASE WHEN d.dup_min IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
        | coalesce(d.dup_min, -1) AS dup_of
        |FROM e LEFT JOIN d ON e.vec_id = d.vec_id ORDER BY 1""".stripMargin,
    // incremental dedup: same string-shingle mirror as q_dedup_ngram
    // (hash-Jaccard ≡ string-Jaccard, see that entry), restricted to
    // pairs whose HIGHER id is in the batch, reduced to the decision
    "q_dedup_incremental" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT b.doc_id AS doc_a, a.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND b.doc_id < a.doc_id
        | WHERE a.doc_id >= 400
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b,
        |  floor(CAST(inter AS DOUBLE) / (na.cnt + nb.cnt - inter) * 10000 + 0.5) / 10000
        |    AS jaccard
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id),
        | hits AS (
        | SELECT doc_b AS doc_id, min(doc_a) AS dup_min, arg_min(jaccard, doc_a) AS dup_jac
        | FROM scored WHERE jaccard >= 0.3 GROUP BY 1)
        |SELECT d.doc_id,
        | CAST(CASE WHEN h.dup_min IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
        | coalesce(h.dup_min, -1) AS dup_of,
        | coalesce(h.dup_jac, 0.0) AS jaccard
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id >= 400 ORDER BY 1""".stripMargin,
    // the shingle-store takedown is EXACT immediately (the df cap is
    // recomputed from live postings at probe time), so the oracle is
    // the q_dedup_incremental SQL with the victims removed from the
    // existing side — the batch side (doc_id >= 400) is untouched
    "q_dedup_incremental_takedown" ->
      """WITH toks AS (
        | SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
        | FROM documents WHERE NOT (doc_id < 400 AND doc_id % 7 = 2)),
        | idx AS (
        | SELECT doc_id, t, unnest(range(1, len(t))) AS i
        | FROM toks WHERE len(t) >= 2),
        | sh AS (SELECT DISTINCT doc_id, concat_ws(' ', t[i], t[i+1]) AS sh FROM idx),
        | capped AS (
        | SELECT * FROM sh
        | WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > 50)),
        | n AS (SELECT doc_id, count(*) AS cnt FROM capped GROUP BY 1),
        | pairs AS (
        | SELECT b.doc_id AS doc_a, a.doc_id AS doc_b, count(*) AS inter
        | FROM capped a JOIN capped b ON a.sh = b.sh AND b.doc_id < a.doc_id
        | WHERE a.doc_id >= 400
        | GROUP BY 1, 2),
        | scored AS (
        | SELECT doc_a, doc_b,
        |  floor(CAST(inter AS DOUBLE) / (na.cnt + nb.cnt - inter) * 10000 + 0.5) / 10000
        |    AS jaccard
        | FROM pairs JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id),
        | hits AS (
        | SELECT doc_b AS doc_id, min(doc_a) AS dup_min, arg_min(jaccard, doc_a) AS dup_jac
        | FROM scored WHERE jaccard >= 0.3 GROUP BY 1)
        |SELECT d.doc_id,
        | CAST(CASE WHEN h.dup_min IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
        | coalesce(h.dup_min, -1) AS dup_of,
        | coalesce(h.dup_jac, 0.0) AS jaccard
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id >= 400 ORDER BY 1""".stripMargin,
    // IndexStore.delete ≡ rebuild over the remaining corpus, so the
    // oracle is the q_doc_index SQL with the victim predicate pushed
    // into the document source
    "q_doc_index_takedown" ->
      """WITH raw AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        |  FROM documents WHERE doc_id % 11 <> 5
        |), toks AS (
        |  SELECT doc_id, lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS word FROM raw
        |), words AS (
        |  SELECT DISTINCT doc_id, word FROM toks WHERE length(word) > 0
        |)
        |SELECT word,
        | string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS doc_ids,
        | count(*) AS n_docs
        |FROM words GROUP BY word ORDER BY n_docs DESC, word""".stripMargin,
  )

  /** DuckDB CTE chain mirroring `Layout.spreadBits`/`zValue` bit for
    * bit: x = user_id (32-bit mask), y = epoch seconds (31-bit mask),
    * five Morton mask/shift rounds on each.
    */
  /** Shared RRF fusion chain (bm25 leg + cosine leg + rank fusion),
    * ending in a `fused` CTE with the top-10 (doc_id, rrf, t_rnk,
    * v_rnk) — the q_hybrid_rrf result, reused as the q_hybrid_rerank
    * candidate set. def: referenced by oracleSql above (init order).
    */
  private def hybridFusedCte =
    """raw AS (
      | SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok FROM documents
      |), t AS (
      | SELECT doc_id, lower(regexp_replace(tok, '[^A-Za-z]+', '', 'g')) AS word FROM raw
      |), tt AS (
      | SELECT doc_id, word FROM t WHERE length(word) > 0
      |), dl AS (
      | SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tt GROUP BY 1
      |), stats AS (
      | SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
      |  (SELECT CAST(count(*) AS DOUBLE) FROM tt)
      |    / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
      |), tf AS (
      | SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf FROM tt
      | WHERE word IN ('spark', 'join', 'window') GROUP BY 1, 2
      |), df AS (
      | SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY 1
      |), bscore AS (
      | SELECT doc_id,
      |  floor(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
      |    * tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)))
      |    * 10000 + 0.5) / 10000 AS score
      | FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
      | GROUP BY doc_id
      |), trnk AS (
      | SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS t_rnk
      | FROM bscore QUALIFY t_rnk <= 20
      |), e AS (
      | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |), q AS (SELECT emb AS q_emb FROM e WHERE vec_id = 0
      |), vs AS (
      | SELECT vec_id AS doc_id,
      |  floor(list_cosine_similarity(emb, q_emb) * 10000 + 0.5) / 10000 AS cos
      | FROM e CROSS JOIN q
      |), vrnk AS (
      | SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS v_rnk
      | FROM vs QUALIFY v_rnk <= 20
      |), fused AS (
      | SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
      |  floor((COALESCE(CAST(1.0 AS DOUBLE) / (60 + t_rnk), 0)
      |       + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v_rnk), 0))
      |    * 10000 + 0.5) / 10000 AS rrf,
      |  CAST(t_rnk AS BIGINT) AS t_rnk, CAST(v_rnk AS BIGINT) AS v_rnk
      | FROM trnk t FULL JOIN vrnk v ON t.doc_id = v.doc_id
      | ORDER BY rrf DESC, doc_id LIMIT 10
      |)""".stripMargin

  private def zSpreadCte = // def: referenced by oracleSql above (init order)
    """WITH e AS (
      | SELECT event_id, CAST(user_id AS BIGINT) AS x,
      |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', CAST(ts AS TIMESTAMP)) AS y
      | FROM events),
      |m AS (SELECT event_id, x, y, x & 4294967295 AS a, y & 2147483647 AS b FROM e),
      |s1 AS (SELECT event_id, x, y, (a | (a << 16)) & 281470681808895 AS a, (b | (b << 16)) & 281470681808895 AS b FROM m),
      |s2 AS (SELECT event_id, x, y, (a | (a << 8)) & 71777214294589695 AS a, (b | (b << 8)) & 71777214294589695 AS b FROM s1),
      |s3 AS (SELECT event_id, x, y, (a | (a << 4)) & 1085102592571150095 AS a, (b | (b << 4)) & 1085102592571150095 AS b FROM s2),
      |s4 AS (SELECT event_id, x, y, (a | (a << 2)) & 3689348814741910323 AS a, (b | (b << 2)) & 3689348814741910323 AS b FROM s3),
      |s5 AS (SELECT event_id, x, y, (a | (a << 1)) & 6148914691236517205 AS a, (b | (b << 1)) & 6148914691236517205 AS b FROM s4)""".stripMargin
}
