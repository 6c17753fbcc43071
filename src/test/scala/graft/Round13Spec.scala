package graft

import org.apache.spark.sql.functions._

import graft.operators.{AudioMatch, Bpe, HybridSearch}

/** Round-13 additions: audio landmark fingerprint matching (the second
  * multimodal modality), the cross-encoder-style rerank stage over the
  * hybrid fusion, and the maintainDictionary crash-resume contract.
  * The DuckDB oracle re-checks the exact outputs at the gate; these
  * specs pin what the oracle can't — recovery semantics across a
  * killed micro-batch, independent-recompute parity, and the physical
  * plan shapes the operators promise.
  */
class Round13Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // --- audio landmark matching ------------------------------------

  /** In-test reference fingerprints: plain Scala over the payload
    * bytes — full frames only, the r15 SPECTRAL feature re-derived
    * from its definition (integer 16-point DFT, round(1024·cos/sin)
    * coefficients, peak/runner-up/ratio-bucket packing, lowest-bin
    * tie-breaks), then target-zone pair keys (dt ∈ [1, MaxDt],
    * key = (e_f·256 + e_{f+dt})·4 + dt). */
  private def refLandmarks(pcm: String): Seq[(Long, Long)] = {
    val w = AudioMatch.FrameLen
    val nF = pcm.length / w
    def feat(f: Int): Long = {
      val smp = (0 until w).map(k => pcm.charAt(f * w + k).toLong)
      val mag2 = (1 to AudioMatch.DftBins).map { b =>
        val re = (0 until w).map(k =>
          smp(k) * math.round(1024 * math.cos(2 * math.Pi * b * k / w))).sum
        val im = (0 until w).map(k =>
          smp(k) * math.round(1024 * math.sin(2 * math.Pi * b * k / w))).sum
        re * re + im * im
      }
      val b1 = mag2.indexOf(mag2.max) + 1 // first max = lowest bin
      val rest = mag2.updated(b1 - 1, -1L)
      val b2 = rest.indexOf(rest.max) + 1
      val (m1, m2) = (mag2(b1 - 1), rest(b2 - 1))
      val r = Seq(2L, 4L, 8L).count(x => m1 >= x * m2)
      (b1 - 1) * 32L + (b2 - 1) * 4L + r
    }
    val en = (0 until nF).map(feat)
    for {
      f <- 0 until nF - 1
      dt <- 1 to math.min(AudioMatch.MaxDt, nF - 1 - f)
    } yield (f.toLong, (en(f) * 256 + en(f + dt)) * 4 + dt)
  }

  test("audio fingerprint equals an independent in-test recompute on every track") {
    val texts = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 2 * AudioMatch.FrameLen)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = texts.toSeq.flatMap { case (id, t) =>
      refLandmarks(t).map { case (f, k) => (id, f, k) }
    }.sorted
    val got = AudioMatch.fingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == expect)
    assert(got.nonEmpty, "fixture produced no landmarks")
  }

  test("audio match: every clip resolves to a full-vote source at the " +
    "clip offset; a foreign winner is only ever a smaller-id track " +
    "whose landmark window is identical to the source's") {
    val rows = AudioMatch.matchClips(spark, sf).collect()
    assert(rows.length > 10, s"too few clips: ${rows.length}")
    // operator invariants: full coherent vote at the clip offset,
    // ALWAYS (the source track guarantees that score exists). Track
    // identity is NOT a fixture-independent invariant — matchClips
    // tie-breaks to the smallest track id among max-vote candidates,
    // so a corpus with byte-identical payloads (or identical landmark
    // windows) legitimately resolves to the duplicate; when that
    // happens we verify the winner's landmarks really do contain the
    // clip's at the reported offset.
    val texts = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (clip, track, off, votes) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(off == AudioMatch.ClipOffFrames, s"clip $clip offset $off")
      assert(votes == AudioMatch.FullVote,
        s"clip $clip votes $votes != full ${AudioMatch.FullVote}")
      if (track != clip) {
        assert(track < clip,
          s"foreign winner $track must out-tie-break source $clip")
        val w = AudioMatch.FrameLen
        val lo = AudioMatch.ClipOffFrames * w
        val clipPcm = texts(clip).substring(lo, lo + AudioMatch.ClipFrames * w)
        val winner = refLandmarks(texts(track)).toSet
        val needed = refLandmarks(clipPcm)
          .map { case (j, k) => (j + AudioMatch.ClipOffFrames, k) }
        assert(needed.forall(winner.contains),
          s"winner $track lacks clip $clip's landmarks at the offset")
      }
    }
    assert(rows.count(r => r.getLong(1) == r.getLong(0)) > 10,
      "nearly all clips should still resolve to their own source")
  }

  test("audio match plan: probe joins broadcast, no cartesian anywhere") {
    val plan = AudioMatch.matchClips(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "clip probe / df-cap joins must broadcast the bounded side")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "no unkeyed join may appear in the match pipeline")
  }

  test("matchClipsIndexed: row-identical to the ad-hoc matcher including " +
    "the cache-hit path; probe join keys include the partition bucket") {
    val adhoc = AudioMatch.matchClips(spark, sf).collect().map(_.toSeq).toSeq
    val first = AudioMatch.matchClipsIndexed(spark, sf).collect().map(_.toSeq).toSeq
    assert(first == adhoc, "indexed result diverges from ad-hoc on index build")
    val again = AudioMatch.matchClipsIndexed(spark, sf).collect().map(_.toSeq).toSeq
    assert(again == adhoc, "indexed result diverges from ad-hoc on cache hit")
    val plan = AudioMatch.matchClipsIndexed(spark, sf)
      .queryExecution.executedPlan.toString
    // the layout contract: the scan is partition-bucketed on kb, the
    // probe carries kb in its join keys, and the planner injects
    // dynamic partition pruning — the probe's runtime key set decides
    // which index buckets are read at all
    assert(plan.contains("PartitionFilters"),
      "index scan must expose partition filters on the bucket column")
    assert(plan.contains("dynamicpruning"),
      "probe must dynamically prune index buckets (DPP not planned)")
    assert(!plan.contains("CartesianProduct"))
  }

  test("incremental audio index: build half + insert half is row-identical " +
    "to the full-corpus ad-hoc matcher") {
    val adhoc = AudioMatch.matchClips(spark, sf).collect().map(_.toSeq).toSeq
    val incr = AudioMatch.matchClipsIncremental(spark, sf).collect().map(_.toSeq).toSeq
    assert(incr == adhoc,
      "insert path diverges from the full rebuild (df partials or postings wrong)")
  }

  test("incremental audio index: a key crossing the df cap AFTER an insert " +
    "stops matching, without any stored posting being rewritten") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-audiocap").toString + "/idx"
    // every track shares one payload -> identical landmark keys; each
    // track adds the same count to every key's df (3 full frames ->
    // two dt=1 landmarks on one key + one dt=2 landmark on another)
    val payload = "abcdefghijklmnop" * 3
    def tracks(ids: Range) = ids.map(i => (i.toLong, payload)).toDF("track_id", "pcm")
    val half = AudioMatch.MaxKeyDf / 2
    AudioMatch.buildIncremental(spark, tracks(0 until half), path)
    val clip = Seq((999L, payload.substring(0, 2 * AudioMatch.FrameLen)))
      .toDF("clip_id", "cpcm")
    // under the cap: the clip matches (first track wins the tie-break)
    val before = AudioMatch.matchAgainst(spark, path, clip).collect()
    assert(before.length == 1 && before(0).getLong(1) == 0L,
      s"clip must match while keys are under the cap: ${before.toSeq}")
    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/landmarks"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => s"${f.getPath}:${f.length}:${f.lastModified}").toSet
    }
    val filesBefore = dataFiles()
    // insert enough copies to push every shared key past the cap
    AudioMatch.insertTracks(spark, path,
      tracks(half until (AudioMatch.MaxKeyDf + 2)))
    assert(filesBefore.subsetOf(dataFiles()),
      "insert must be append-only: an existing posting file was rewritten")
    val after = AudioMatch.matchAgainst(spark, path, clip).collect()
    assert(after.isEmpty,
      s"over-cap keys must stop matching at query time: ${after.toSeq}")
  }

  test("streamingAudioIngest: per-batch verdicts equal a replay against the " +
    "accumulated index; first copy unmatched, a later re-upload matches it") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-audioing-src").toString
    val out = java.nio.file.Files.createTempDirectory("graft-audioing").toString
    val tracks = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 2 * AudioMatch.FrameLen)
      .select(col("doc_id").as("track_id"),
        decode(encode(col("text"), "UTF-8"), "UTF-8").as("pcm"))
    // catalog arrives first (two files), then a RE-UPLOAD of the
    // longest track under a new id in a later-mtime file
    tracks.filter(col("track_id") < 300).repartition(1)
      .write.mode("append").parquet(src)
    tracks.filter(col("track_id") >= 300).repartition(1)
      .write.mode("append").parquet(src)
    val orig = tracks.orderBy(length(col("pcm")).desc, col("track_id").asc)
      .select(col("track_id"), col("pcm")).head()
    Thread.sleep(1100) // distinct mtime => the dup file streams last
    Seq((1000000L, orig.getString(1))).toDF("track_id", "pcm")
      .repartition(1).write.mode("append").parquet(src)

    val stream = spark.readStream.schema("track_id LONG, pcm STRING")
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = graft.streaming.EventStream.streamingAudioIngest(stream, out)
    try q.processAllAvailable() finally q.stop()

    val ids = new java.io.File(s"$out/index/landmarks").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName.stripPrefix("batch=").toLong)
      .sorted
    assert(ids.length >= 3, s"expected >=3 micro-batches, got ${ids.toSeq}")
    val all = tracks.unionByName(
      Seq((1000000L, orig.getString(1))).toDF("track_id", "pcm"))
    def lmkOf(i: Long) = spark.read
      .parquet(s"$out/index/landmarks/batch=$i")
      .select(col("track_id"), col("f"), col("key"), col("kb"))
    for (i <- ids) {
      val prior = ids.filter(_ < i)
      val priorLmk =
        if (prior.isEmpty) lmkOf(i).limit(0)
        else prior.map(lmkOf).reduce(_ unionByName _)
      val batchIds = spark.read.parquet(s"$out/index/landmarks/batch=$i")
        .select(col("track_id")).distinct()
      val clips = AudioMatch.trackClips(
        all.join(batchIds, Seq("track_id")))
      val expected = AudioMatch.probeIndex(priorLmk,
          priorLmk.groupBy(col("key")).agg(count(lit(1)).as("cnt")),
          clips).collect().map(_.toSeq).toSeq
      val got = spark.read.parquet(s"$out/matches/batch=$i")
        .select(col("clip_id"), col("track_id"), col("offset_frames"), col("votes"))
        .orderBy(col("clip_id")).collect().map(_.toSeq).toSeq
      assert(got == expected, s"batch $i verdicts diverge from replay")
    }
    // the re-upload must match its original at the clip offset
    val dup = spark.read.parquet(s"$out/matches")
      .filter(col("clip_id") === 1000000L).collect()
    assert(dup.length == 1, s"re-upload verdict missing: ${dup.toSeq}")
    assert(dup(0).getLong(1) == orig.getLong(0) &&
      dup(0).getLong(2) == AudioMatch.ClipOffFrames &&
      dup(0).getLong(3) == AudioMatch.FullVote,
      s"re-upload must match its original with a full coherent vote: ${dup(0)}")
  }

  test("degenerate audio index: zero landmark-eligible tracks build an " +
    "empty index that probes cleanly (no schema-inference death)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-audioempty")
      .toString + "/idx"
    // every track shorter than two frames -> zero landmarks staged
    AudioMatch.buildIncremental(spark,
      Seq((1L, "tiny"), (2L, "x")).toDF("track_id", "pcm"), path)
    val clip = Seq((9L, "abcdefghijklmnop" * 2)).toDF("clip_id", "cpcm")
    val out = AudioMatch.matchAgainst(spark, path, clip)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq ==
      Seq("clip_id", "track_id", "offset_frames", "votes"))
    // inserting real tracks afterwards revives the index
    AudioMatch.insertTracks(spark,  path,
      Seq((3L, "abcdefghijklmnop" * 3)).toDF("track_id", "pcm"))
    val revived = AudioMatch.matchAgainst(spark, path, clip).collect()
    assert(revived.length == 1 && revived(0).getLong(1) == 3L)
  }

  test("matchClipsAll: duplicate catalog tracks EACH report (the top-1 " +
    "variant would keep only the tie-break winner); vote floor holds") {
    import spark.implicits._
    // 12 DISTINCT frames (a frame-periodic payload would coherently
    // match at every offset — correct, but not what this test pins);
    // tone-coded since r15: constant-char frames are spectrally void
    val payload = ToneAudio.payload(0 until 12)
    val idx = AudioMatch.trackLandmarks(
        Seq((7L, payload), (3L, payload),
          (9L, ToneAudio.payload(Seq(40, 41, 42, 43))))
          .toDF("track_id", "pcm"))
      .withColumn("kb", pmod(col("key"), lit(AudioMatch.KeyBuckets)))
    // clip = frames 0..5 of the duplicated payload (5+4+3 = 12
    // target-zone landmarks at MaxDt = 3)
    val clipVote = (1 to AudioMatch.MaxDt).map(6 - _).sum.toLong
    val clip = Seq((100L, payload.substring(0, 6 * AudioMatch.FrameLen)))
      .toDF("clip_id", "cpcm")
    val all = AudioMatch.allCoherentMatches(idx, clip).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(all.toSet == Set((3L, 0L, clipVote), (7L, 0L, clipVote)),
      s"both duplicate tracks must report with full votes: ${all.toSeq}")
    // the top-1 probe keeps only the smaller track id
    val top = AudioMatch.probeIndex(idx,
      idx.groupBy(col("key")).agg(count(lit(1)).as("cnt")), clip).collect()
    assert(top.length == 1 && top(0).getLong(1) == 3L)
    // below the floor: a 3-frame clip has 2+1 = 3 coherent votes,
    // under MinVotes (= FullVote/2 = 9)
    val short = Seq((101L, payload.substring(0, 3 * AudioMatch.FrameLen)))
      .toDF("clip_id", "cpcm")
    assert(AudioMatch.allCoherentMatches(idx, short).collect().isEmpty)
  }

  // --- cross-encoder rerank ----------------------------------------

  test("ceRerank: scores equal an independent in-test recompute over " +
    "the fused candidates; ranks follow (score desc, doc_id)") {
    val terms = Seq("spark", "join", "window")
    val fusedIds = HybridSearch.rrfFusion(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val texts = Tables.load(spark, sf, "documents")
      .filter(col("doc_id").isin(fusedIds.toSeq: _*))
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def score(t: String): Long = {
      val hits = t.split("\\s+").zipWithIndex
        .map { case (w, p) => (w.toLowerCase.replaceAll("[^A-Za-z]+", ""), p.toLong) }
        .filter { case (w, _) => terms.contains(w) }
      val nHits = hits.length.toLong
      val nProx = (for {
        (wa, pa) <- hits; (wb, pb) <- hits
        if wa < wb && math.abs(pa - pb) <= 8
      } yield 1).size.toLong
      nProx * 10 + nHits
    }
    val got = HybridSearch.ceRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == fusedIds,
      "rerank must keep exactly the fused candidate set")
    got.foreach { case (id, ce, _) =>
      // a fused doc can be vector-leg-only with no document row
      val expect = texts.get(id).map(score).getOrElse(0L)
      assert(ce == expect, s"doc $id ce_score $ce != recomputed $expect")
    }
    val byRank = got.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == (1L to got.length).toSeq)
    byRank.sliding(2).foreach {
      case Array((idA, ceA, _), (idB, ceB, _)) =>
        assert(ceA > ceB || (ceA == ceB && idA < idB),
          s"rank order violated between $idA and $idB")
      case _ =>
    }
  }

  test("ceRerank plan: candidate fetch is a broadcast semi-ish join — " +
    "the corpus never reaches the pair scorer") {
    val plan = HybridSearch.ceRerank(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "candidate ids must broadcast into the documents scan")
    assert(!plan.contains("CartesianProduct"))
  }

  // --- streaming dictionary: crash-resume --------------------------

  test("maintainDictionary crash-resume: a mid-stage crash re-stages, a " +
    "staged-but-unrebuilt crash skips the stage write, and the recovered " +
    "dictionary retrains identically to the corpus train") {
    import graft.streaming.EventStream
    val docs = Tables.load(spark, sf, "documents").select(col("text"), col("doc_id"))
    val staged = java.nio.file.Files.createTempDirectory("graft-dictcr-src").toString
    val parent = java.nio.file.Files.createTempDirectory("graft-dictcr").toString
    val path = s"$parent/words"
    val ckpt = s"$parent/ckpt"
    val stagingKey = java.security.MessageDigest.getInstance("MD5")
      .digest(ckpt.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val staging = s"$path.batches-$stagingKey"
    def part(i: Int) = docs.filter(col("doc_id") % 5 === i).select(col("text"))
    def run(): Unit = {
      val src = spark.readStream.schema("text STRING")
        .option("maxFilesPerTrigger", 1).parquet(staged)
      val q = EventStream.maintainDictionary(src, path, Some(ckpt))
      try q.processAllAvailable() finally q.stop()
    }
    def nextBatchId(): Long = {
      val ids = Option(new java.io.File(staging).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName.stripPrefix("batch=").toLong)
      if (ids.isEmpty) 0L else ids.max + 1
    }

    // phase 1: three clean micro-batches (parts 1, 2, 3)
    (1 to 3).foreach(i =>
      part(i).repartition(1).write.mode("append").parquet(staged))
    run()

    // CRASH SHAPE A — killed MID-STAGE WRITE: the next batch's dir has
    // partial (and WRONG) data and no _SUCCESS. The restarted stream
    // must overwrite it with the true batch counts; if the partial dir
    // were trusted, the final dictionary would undercount part 4.
    part(4).repartition(1).write.mode("append").parquet(staged)
    val crashA = s"$staging/batch=${nextBatchId()}"
    Bpe.wordCounts(part(4).limit(2)).write.mode("overwrite").parquet(crashA)
    assert(new java.io.File(s"$crashA/_SUCCESS").delete(),
      "test setup: partial stage dir must lack the _SUCCESS marker")
    run()
    assert(new java.io.File(s"$crashA/_SUCCESS").exists(),
      "restart must re-stage the partial batch dir")

    // CRASH SHAPE B — killed BETWEEN STAGE AND REBUILD: the batch dir
    // is complete (counts + _SUCCESS) but the serving table was never
    // rebuilt. The restarted stream must SKIP the stage write (exactly
    // once — the staged files stay byte-identical) and recover the
    // serving table via the rebuild.
    part(0).repartition(1).write.mode("append").parquet(staged)
    val crashB = s"$staging/batch=${nextBatchId()}"
    Bpe.wordCounts(part(0)).write.mode("overwrite").parquet(crashB)
    graft.operators.ArtifactCache.deleteRecursively(new java.io.File(path))
    def listing(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = listing(crashB)
    run()
    assert(listing(crashB) == before,
      "replayed batch must skip its stage write (files changed)")

    // recovered dictionary == the one-shot corpus dictionary, and
    // training from it reproduces the corpus merge table exactly
    val recovered = spark.read.parquet(path)
    val corpus = Bpe.wordCounts(docs.select(col("text")))
    assert(recovered.except(corpus).isEmpty && corpus.except(recovered).isEmpty,
      "recovered dictionary diverges from the corpus dictionary")
    val fromRecovered = Bpe.bpeTrainFromCounts(spark, recovered).collect().toSeq
    val fromCorpus = Bpe.bpeTrain(spark, sf).collect().toSeq
    assert(fromRecovered == fromCorpus,
      "retrain from the recovered dictionary diverges from corpus train")
  }
}
