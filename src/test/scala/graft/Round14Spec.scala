package graft

import org.apache.spark.sql.functions._

import graft.operators.{AudioMatch, Multimodal}

/** Round-14 scale/robustness work. The DuckDB oracle gate re-checks
  * the exact outputs; these specs pin what the oracle can't — the
  * NO-MISS property of the reworked exact-media candidate generation
  * and the physical shape that makes it scale (one grouping shuffle,
  * map-side pair generation, no pre-verify shuffle join).
  */
class Round14Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // --- q_media_neardups_exact: gram-keyed candidate generation ------

  /** In-test brute recompute of the candidate semantics: the set of
    * ordered media pairs sharing ANY stride-4 16-byte window whose
    * corpus-wide distinct-media frequency is in [2, maxDf]. Plain
    * Scala over collected payloads — no Spark machinery shared with
    * the operator under test.
    */
  private def refWindowPairs(maxDf: Int): Set[(Long, Long)] = {
    val payloads = Multimodal.mediaTable(spark, sf)
      .select(col("media_id"), col("content")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val byWin = scala.collection.mutable.Map.empty[Seq[Byte], Set[Long]]
    payloads.foreach { case (id, bytes) =>
      val last = math.max(bytes.length - 16, 0)
      (0 to last by 4).foreach { p =>
        if (p + 16 <= bytes.length) {
          val w = bytes.slice(p, p + 16).toSeq
          byWin(w) = byWin.getOrElse(w, Set.empty) + id
        }
      }
    }
    byWin.values
      .filter(ms => ms.size >= 2 && ms.size <= maxDf)
      .flatMap(ms => ms.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
  }

  test("exact media near-dup candidates: the grouped-set generation is " +
    "NO-MISS vs a brute window-share recount (and no extras)") {
    // threshold 0 keeps every candidate in the output, exposing the
    // candidate set itself through the public operator
    val got = Multimodal.mediaNearDupsExact(spark, sf, threshold = 0.0)
      .select(col("media_a"), col("media_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = refWindowPairs(maxDf = 64)
    val missed = want -- got
    val extra = got -- want
    assert(missed.isEmpty, s"dropped window-sharing pairs: ${missed.take(5)}")
    assert(extra.isEmpty, s"phantom candidates: ${extra.take(5)}")
    assert(want.nonEmpty, "fixture produced no window-sharing pairs")
  }

  test("exact media near-dup plan, small-corpus regime (gate skipped): " +
    "ONE grouping shuffle, no shuffle joins, broadcast-only verification") {
    val plan = Multimodal.mediaNearDupsExact(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "candidate generation must not shuffle-join the window relation " +
        "(the 7.07x/decade r13 shape)")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "no unkeyed join may appear")
    assert(plan.contains("BroadcastHashJoin"),
      "histogram verification lookups must broadcast")
    assert(!plan.contains("LeftSemi"),
      "a sub-GateBytes corpus must skip the count gate (it can only cost)")
    // exactly one aggregate keyed on the raw window bytes: partial +
    // final of the ONE grouping
    val winAggs = plan.split("\n").count(l =>
      l.contains("HashAggregate") && l.contains("keys=[win"))
    assert(winAggs == 2,
      s"expected one partial+final window aggregate pair, saw $winAggs")
  }

  test("exact media near-dup plan, gated regime (forced): the count " +
    "gate's semi filter sits BELOW the set aggregation's exchange — " +
    "singleton windows are dropped before a row shuffles or buffers — " +
    "and the result is row-identical to the ungated plan") {
    val gated = Multimodal.mediaNearDupsExactGated(spark, sf,
      threshold = 0.0, maxDf = 64, gateBytes = 0L, keepFraction = 1.01)
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
    // count + capped-set aggregations on win, each partial+final
    val winAggs = plan.split("\n").count(l =>
      l.contains("HashAggregate") && l.contains("keys=[win"))
    assert(winAggs == 4,
      s"expected count + capped-set aggregate pairs on win, saw $winAggs")
    val lines = plan.split("\n")
    val partialSet = lines.indexWhere(_.contains("partial_cappeddistinct"))
    val semi = lines.indexWhere(_.contains("LeftSemi"))
    assert(partialSet >= 0 && semi > partialSet,
      s"count-gate semi must feed the partial set aggregation " +
        s"(partial at $partialSet, semi at $semi)")
    // gating is an EXECUTION choice, never a semantic one
    val got = gated.collect().map(_.toSeq).toSeq
    val want = Multimodal.mediaNearDupsExact(spark, sf, threshold = 0.0)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "gated and ungated plans must be row-identical")
  }

  // --- audio landmark fan-out robustness ----------------------------

  test("audio target-zone fan-out: an excerpt with every other frame " +
    "corrupted still matches coherently, while a dt=1-only " +
    "constellation collects ZERO votes on the same bytes") {
    import spark.implicits._
    val w = AudioMatch.FrameLen
    // 16 tone frames with pairwise-distinct spectral features
    // (ToneAudio classes 0..15 map to 16 distinct (b1, b2) pairs)
    val payload = ToneAudio.payload(0 until 16)
    val track = Seq((1L, payload)).toDF("track_id", "pcm")
    // clip = frames 4..11 of the track, then its odd frames 1,3,5,7
    // TONE-SWAPPED to classes the track never plays (25/27/29/31 use
    // the runner-up-offset-4 family, absent from classes 0..15) —
    // heavy enough corruption to flip the spectral feature (a ±1 byte
    // flip is absorbed by the peak-pick now, by design). Every dt=1
    // pair inside the clip touches a corrupted frame, so the dt=1
    // chain is fully severed; the even frames 0,2,4,6 survive and
    // pair at dt=2, and the corrupted classes pair only with each
    // other under keys the track index doesn't contain
    val lo = AudioMatch.ClipOffFrames * w
    val clean = payload.substring(lo, lo + AudioMatch.ClipFrames * w)
    val corrupted = new StringBuilder(clean)
    Seq(1, 3, 5, 7).zip(Seq(25, 27, 29, 31)).foreach { case (f, cls) =>
      corrupted.replace(f * w, (f + 1) * w, ToneAudio.frame(cls)) }
    val clip = Seq((100L, corrupted.toString)).toDF("clip_id", "cpcm")

    val dt1 = AudioMatch.allCoherentMatches(
      AudioMatch.trackLandmarks(track, maxDt = 1), clip,
      minVotes = 1, maxDt = 1).collect()
    assert(dt1.isEmpty,
      s"dt=1-only constellation must be defeated by the flips: ${dt1.toSeq}")

    val fan = AudioMatch.allCoherentMatches(
      AudioMatch.trackLandmarks(track), clip, minVotes = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // surviving coherent votes: the dt=2 pairs between clean frames
    // (0,2), (2,4), (4,6) — all at the true offset
    assert(fan.toSeq == Seq((100L, 1L,
        AudioMatch.ClipOffFrames.toLong, 3L)),
      s"fan-out must keep the corrupted excerpt matchable: ${fan.toSeq}")
  }

  // --- schema-drift ingestion -----------------------------------------

  test("schema-drift fixture is PHYSICALLY drifted (INT96 vs INT64 ts, " +
    "INT32 vs INT64 keys, added column) and the evolved loader reads " +
    "both epochs losslessly") {
    import graft.sources.SchemaDrift
    val root = SchemaDrift.driftedCorpus(spark, sf)
    def footerType(dir: String, colName: String): Option[String] = {
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath),
        spark.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField(colName)) None
        else Some(schema.getType(schema.getFieldIndex(colName))
          .asPrimitiveType().getPrimitiveTypeName.toString)
      } finally reader.close()
    }
    // the r9 incident class made first-class: same logical timestamp,
    // two physical encodings across epochs
    assert(footerType(s"$root/v1", "ts").contains("INT96"))
    assert(footerType(s"$root/v2", "ts").contains("INT64"))
    assert(footerType(s"$root/v1", "o_orderkey").contains("INT32"))
    assert(footerType(s"$root/v2", "o_orderkey").contains("INT64"))
    assert(footerType(s"$root/v1", "channel").isEmpty, "v1 must lack channel")
    assert(footerType(s"$root/v2", "channel").contains("BINARY"))

    // losslessness: the evolved read equals the original rows pushed
    // through the same normalization (independent recompute, no loader)
    val got = SchemaDrift.readEvolved(spark,
        Seq((s"$root/v1", 0L), (s"$root/v2", 1L)))
      .select(col("epoch"), col("o_orderkey"), col("amount").cast("string"),
        unix_micros(col("ts")), coalesce(col("channel"), lit("-")))
      .collect().map(_.toSeq).toSet
    val want = Tables.load(spark, sf, "orders")
      .select((col("o_orderkey") % 2).as("epoch"), col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0,
          col("o_totalprice").cast("decimal(12,2)").cast("decimal(18,4)"))
          .otherwise(col("o_totalprice").cast("decimal(18,4)"))
          .cast("string"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        when(col("o_orderkey") % 2 === 1,
          concat(lit("ch"), (col("o_orderkey") % 3).cast("string")))
          .otherwise(lit("-")))
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"evolved read diverges: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    assert(got.nonEmpty)
  }

  // --- streaming audio keydf: compactStaging composes ------------------

  test("streaming audio ingest keydf: compactStaging folds the per-batch " +
    "df partials into one data-bearing dir, probes stay byte-identical, " +
    "and a resumed stream appends past the compaction") {
    import spark.implicits._
    import graft.streaming.EventStream
    val src = java.nio.file.Files.createTempDirectory("graft-audiocmp-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-audiocmp").toString
    val w = AudioMatch.FrameLen
    // tone-coded since r15 (spectral features): scrambled class walk —
    // a LINEAR class progression would alias across seeds (two tracks
    // become frame-shifted copies in class space and cross-match)
    def payload(seed: Int) = ToneAudio.payload((0 until 14)
      .map(i => ((((seed * 14 + i) * 2654435761L) >>> 7) % 56).toInt))
    def file(ids: Range): Unit = {
      ids.map(i => (i.toLong, payload(i))).toDF("track_id", "pcm")
        .repartition(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes -> deterministic batch order
    }
    def run(): Unit = {
      val stream = spark.readStream.schema("track_id LONG, pcm STRING")
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = EventStream.streamingAudioIngest(stream, out, Some(s"$out/ckpt"))
      try q.processAllAvailable() finally q.stop()
    }
    (0 until 3).foreach(b => file(b * 2 until b * 2 + 2))
    run()

    val keydf = s"$out/index/keydf"
    def dataDirs(): Seq[String] = new java.io.File(keydf).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("batch=") &&
        Option(d.listFiles()).toSeq.flatten.exists(_.getName.endsWith(".parquet")))
      .map(_.getName).sorted.toSeq
    assert(dataDirs().size >= 3, s"expected >=3 staged partials: ${dataDirs()}")
    val clips = AudioMatch.trackClips(
      Seq((0L, payload(0)), (5L, payload(5))).toDF("track_id", "pcm"))
    val before = AudioMatch.matchAgainst(spark, s"$out/index", clips)
      .collect().map(_.toSeq).toSeq
    assert(before.nonEmpty)

    // OFFLINE compaction of the df partials (stream stopped): one
    // data-bearing dir remains, every original keeps its _SUCCESS so
    // replays still skip their stage write, and the probe — which sums
    // partials — is byte-identical
    EventStream.compactStaging(spark, keydf)
    assert(dataDirs().size == 1, s"expected one merged dir: ${dataDirs()}")
    assert(new java.io.File(keydf).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("batch="))
      .forall(d => new java.io.File(d, "_SUCCESS").exists()),
      "stripped batch dirs must keep their replay markers")
    val after = AudioMatch.matchAgainst(spark, s"$out/index", clips)
      .collect().map(_.toSeq).toSeq
    assert(after == before, "probe diverged across keydf compaction")

    // the stream resumes PAST the compaction: new batches append fresh
    // partials and their content becomes probe-visible
    file(6 until 8)
    run()
    assert(dataDirs().size == 2, s"resume must append one partial: ${dataDirs()}")
    val clip7 = AudioMatch.matchAgainst(spark, s"$out/index",
      AudioMatch.trackClips(Seq((7L, payload(7))).toDF("track_id", "pcm")))
      .collect()
    assert(clip7.length == 1 && clip7(0).getLong(1) == 7L,
      s"post-compaction ingest must be probe-visible: ${clip7.toSeq}")
  }

  // --- pagerank: chunked lazy iterations stay bit-exact ---------------

  test("pageRank chunked execution: a 7-iteration run (5+2 chunk split) " +
    "equals an independent in-test integer recompute node for node") {
    import graft.operators.Graphs
    val unit = 1000000000000L
    val pairs = Tables.load(spark, sf, "lineitem")
      .select(concat(lit("s"), col("l_suppkey")).as("sn"),
        concat(lit("p"), col("l_partkey")).as("pn"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val n = deg.size.toLong
    var r = deg.keys.map(_ -> unit / n).toMap
    val teleport = (15L * unit) / (100L * n)
    (1 to 7).foreach { _ =>
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (src, dst) =>
        contrib(dst) = contrib.getOrElse(dst, 0L) + r(src) / deg(src)
      }
      r = deg.keys.map(k =>
        k -> (teleport + (85L * contrib.getOrElse(k, 0L)) / 100L)).toMap
    }
    val want = r.toSeq.sortBy { case (k, v) => (-v, k) }
    val got = Graphs.pageRank(spark, sf, iters = 7).collect()
      .map(row => (row.getString(0), row.getLong(1))).toSeq
    assert(got == want, {
      val bad = got.zip(want).find { case (g, w) => g != w }
      s"chunked pagerank diverges from the reference recompute at $bad"
    })
  }

  // --- entity resolution: anchor-star degradation ---------------------

  test("fuzzyNamesUnionBlocked anchor-star path: a block past maxBlock " +
    "degrades to anchor pairs exactly as documented (in-test recompute); " +
    "non-anchor in-block pairs are knowingly dropped, small blocks stay full") {
    import spark.implicits._
    import graft.operators.EntityResolution
    // 'rod' head-noun block has 4 distinct names (> maxBlock=2) -> star;
    // 'zeta' first-token block has 2 (<= cap) -> full pairs
    val names = Seq("alpha rod", "alphb rod", "alphc rod", "delta rod",
      "zeta cap", "zeta cup")
    val maxDist = 2
    val got = EntityResolution.fuzzyNamesUnionBlockedRel(
        names.toDF("p_name"), maxDist = maxDist, maxBlock = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def leg(key: String => String): Set[(String, String)] =
      names.distinct.groupBy(key).values.flatMap { block =>
        val sorted = block.distinct.sorted
        if (sorted.size > 2) {
          val anchor = sorted.head
          sorted.tail.filter(x => math.abs(x.length - anchor.length) <= maxDist)
            .map(x => (anchor, x))
        } else for {
          x <- sorted; y <- sorted
          if x < y && math.abs(x.length - y.length) <= maxDist
        } yield (x, y)
      }.toSet
    val want = (leg(_.split(" ").last) ++ leg(_.split(" ").head))
      .filter { case (a, b) => lev(a, b) <= maxDist }
      .toSeq.sorted.map { case (a, b) => (a, b, lev(a, b).toLong) }
    assert(got == want, s"got=$got want=$want")
    // the star really engaged: anchor pairs present, a non-anchor
    // in-block pair (full-pairs mode would emit it at dist 1) absent
    assert(got.contains(("alpha rod", "alphb rod", 1L)))
    assert(!got.exists(p => p._1 == "alphb rod" && p._2 == "alphc rod"),
      "non-anchor pair leaked — the big-block leg ran full pairs")
    // the small-block leg stayed full-pairs
    assert(got.contains(("zeta cap", "zeta cup", 1L)))
  }

  // --- incremental audio index: keydf compaction ---------------------

  test("compactKeyDf: many insert partials collapse to one file with a " +
    "byte-identical probe; crash at either phase boundary resumes; a " +
    "mid-swap probe refuses; a racing insert's partial survives") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-audiocompact")
      .toString + "/idx"
    val w = AudioMatch.FrameLen
    // tone-coded since r15 (spectral features): scrambled class walk —
    // a LINEAR class progression would alias across seeds (two tracks
    // become frame-shifted copies in class space and cross-match)
    def payload(seed: Int) = ToneAudio.payload((0 until 14)
      .map(i => ((((seed * 14 + i) * 2654435761L) >>> 7) % 56).toInt))
    def tracks(ids: Seq[Int]) = ids.map(i => (i.toLong, payload(i)))
      .toDF("track_id", "pcm")
    AudioMatch.buildIncremental(spark, tracks(Seq(0, 1)), path)
    (2 to 4).foreach(i => AudioMatch.insertTracks(spark, path, tracks(Seq(i))))
    def dfFiles() = new java.io.File(s"$path/keydf").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq
    assert(dfFiles().size == 4, s"expected 4 partials, got ${dfFiles().size}")
    val clips = AudioMatch.trackClips(tracks(Seq(0, 3)))
    val before = AudioMatch.matchAgainst(spark, path, clips)
      .collect().map(_.toSeq).toSeq
    assert(before.nonEmpty)

    // CRASH between phase A and B: merged temp + marker exist, swap
    // not started — a probe must refuse (finishing the compaction is
    // the only way the df table is consistent again)
    assert(AudioMatch.compactKeyDfPhaseA(spark, path))
    val mid = intercept[IllegalStateException] {
      AudioMatch.matchAgainst(spark, path, clips)
    }
    assert(mid.getMessage.contains("pending keydf compaction"))
    // a racing insert lands while the swap is pending — its partial is
    // NOT in the commit marker's merge list and must survive
    AudioMatch.insertTracks(spark, path, tracks(Seq(5)))
    // CRASH mid-phase-B: one merged input already stripped; re-running
    // the whole compaction must resume from the marker (NOT re-merge
    // over the half-swapped table) and land in the identical end state
    val marker = new java.io.File(s"$path/keydf/.compact-commit")
    val listed = new String(java.nio.file.Files.readAllBytes(marker.toPath),
      "UTF-8").split("\n").filter(_.nonEmpty)
    assert(new java.io.File(s"$path/keydf/${listed.head}").delete())
    AudioMatch.compactKeyDf(spark, path)

    assert(!marker.exists())
    assert(dfFiles().size == 2, // the merged file + the racing insert's
      s"expected merged+racing partials, got ${dfFiles().map(_.getName).toSeq}")
    val after = AudioMatch.matchAgainst(spark, path, clips)
      .collect().map(_.toSeq).toSeq
    assert(after == before, "probe diverged across compaction")
    // full-corpus sanity incl. the racing insert: its clip matches
    val clip5 = AudioMatch.matchAgainst(spark, path,
      AudioMatch.trackClips(tracks(Seq(5)))).collect()
    assert(clip5.length == 1 && clip5(0).getLong(1) == 5L)
    // idempotent: a second compaction merges the two survivors to one
    AudioMatch.compactKeyDf(spark, path)
    assert(dfFiles().size == 1)
    assert(AudioMatch.matchAgainst(spark, path, clips)
      .collect().map(_.toSeq).toSeq == before)
  }
}
