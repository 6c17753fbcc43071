package graft

import org.apache.spark.sql.functions._

import graft.operators.{ArtifactCache, AudioMatch, Dedup, IndexStore,
  MediaGroupsInc, MediaIndexOps, Multimodal, PerceptualHash, Takedown}

/** Round-18 specs: audio track takedown (the last media modality
  * without one), the text-side delete lifecycles (letter-partitioned
  * inverted index + persisted shingle store), the de-pinned
  * takedown-flood compaction, the unified [[Takedown]] facade's refuse
  * matrix, and the compaction-time hv prune of takedown victims'
  * derived vectors.
  */
class Round18Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def audioTracks = Multimodal.mediaTable(spark, sf)
    .filter(col("kind") === "audio")
    .select(col("media_id").as("track_id"),
      decode(col("content"), "UTF-8").as("pcm"))

  // --- audio landmark index: takedown lifecycle --------------------------

  test("audio index delete: a tombstoned track stops matching immediately, " +
    "compact touches only its buckets (untouched buckets byte-identical) " +
    "and delete+compact equals a rebuild without the track") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-adel").toString
    val rb = java.nio.file.Files.createTempDirectory("graft-adel-rb").toString
    try {
      val tracks = audioTracks
      AudioMatch.buildIncremental(spark, tracks, path)
      val clips = AudioMatch.trackClips(tracks)
      val before = AudioMatch.matchAgainst(spark, path, clips).collect()
      assert(before.nonEmpty, "fixture must produce matches")
      // take down the best-matched track (a clip's own source)
      val victim = before.head.getAs[Long]("track_id")
      val victimBuckets = spark.read.parquet(s"$path/landmarks")
        .filter(col("track_id") === victim)
        .select(col("kb").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(victimBuckets.nonEmpty)
      def bucketMtimes(): Map[String, Long] =
        Option(new java.io.File(s"$path/landmarks").listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("kb="))
          .flatMap(d => Option(d.listFiles()).toSeq.flatten
            .map(f => s"${d.getName}/${f.getName}" -> f.lastModified()))
          .toMap
      val mtimesBefore = bucketMtimes()
      MediaIndexOps.delete(spark, path, Seq(victim).toDF("track_id"), "track_id")
      val afterDelete = AudioMatch.matchAgainst(spark, path, clips).collect()
      assert(!afterDelete.exists(_.getAs[Long]("track_id") == victim),
        "tombstoned track must stop matching immediately")
      MediaIndexOps.compact(spark, path, "landmarks", "track_id")
      val mtimesAfter = bucketMtimes()
      val untouched = mtimesBefore.keySet.filter { k =>
        val b = k.split("/")(0).stripPrefix("kb=").toLong
        !victimBuckets.contains(b)
      }
      assert(untouched.nonEmpty, "fixture must leave some buckets untouched")
      untouched.foreach { k =>
        assert(mtimesAfter.get(k).contains(mtimesBefore(k)),
          s"untouched bucket file $k must not be rewritten")
      }
      assert(spark.read.parquet(s"$path/landmarks")
        .filter(col("track_id") === victim).count() == 0)
      assert(!new java.io.File(s"$path/deleted").exists())
      // delete + compact == rebuild without the victim: identical
      // verdicts AND identical live df statistic
      AudioMatch.buildIncremental(spark,
        tracks.filter(col("track_id") =!= victim), rb)
      val got = AudioMatch.matchAgainst(spark, path, clips).collect().toSeq
      val want = AudioMatch.matchAgainst(spark, rb, clips).collect().toSeq
      assert(got == want, s"compacted=${got.take(3)} rebuilt=${want.take(3)}")
      def liveDf(p: String): Map[Long, Long] =
        spark.read.parquet(s"$p/keydf").groupBy(col("key"))
          .agg(sum(col("cnt")).as("df")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 != 0L).toMap
      assert(liveDf(path) == liveDf(rb),
        "negative partials must reconcile the df to the rebuild's")
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(path))
      ArtifactCache.deleteRecursively(new java.io.File(rb))
    }
  }

  test("audio probe refuses while a tombstone compaction is mid-swap") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-adel-mid").toString
    try {
      val tracks = audioTracks
      AudioMatch.buildIncremental(spark, tracks, path)
      val victim = tracks.select(col("track_id")).head().getLong(0)
      MediaIndexOps.delete(spark, path, Seq(victim).toDF("track_id"), "track_id")
      assert(MediaIndexOps.compactPhaseA(spark, path, "landmarks", "track_id"))
      intercept[IllegalStateException] {
        AudioMatch.matchAgainst(spark, path,
          AudioMatch.trackClips(tracks)).collect()
      }
      MediaIndexOps.compact(spark, path, "landmarks", "track_id")
      assert(!MediaIndexOps.pendingApply(path))
    } finally ArtifactCache.deleteRecursively(new java.io.File(path))
  }

  // --- de-pinned compaction: takedown flood ------------------------------

  test("takedown-flood compaction (majority of buckets touched) completes " +
    "via disk staging and equals a rebuild; deleting EVERYTHING empties " +
    "every touched bucket explicitly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-flood").toString
    val rb = java.nio.file.Files.createTempDirectory("graft-flood-rb").toString
    try {
      // ids spread over every chunk bucket; delete 70% of the catalog
      val base = (0L until 200L).map(i => (i, 0x00F0F0F0F0F0F0L ^ i))
        .toDF("media_id", "phash")
      PerceptualHash.buildImageIndex(spark, base, path)
      val victims = base.filter(col("media_id") % 10 < 7).select(col("media_id"))
      MediaIndexOps.delete(spark, path, victims, "media_id")
      MediaIndexOps.compact(spark, path, "chunks", "media_id")
      assert(!MediaIndexOps.pendingApply(path))
      assert(new java.io.File(s"$path/chunks/.del-tmp").exists() == false,
        "staging dir must be cleaned up")
      PerceptualHash.buildImageIndex(spark,
        base.filter(col("media_id") % 10 >= 7), rb)
      def pairs(p: String) = PerceptualHash.imageNearDupsAgainst(spark, p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs(path) == pairs(rb))
      def liveDf(p: String): Map[Long, Long] =
        spark.read.parquet(s"$p/keydf").groupBy(col("key"))
          .agg(sum(col("cnt")).as("df")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 != 0L).toMap
      assert(liveDf(path) == liveDf(rb))
      // now delete the rest: the staged survivor slice is EMPTY and
      // every touched bucket must be dropped explicitly
      MediaIndexOps.delete(spark, path,
        base.filter(col("media_id") % 10 >= 7).select(col("media_id")),
        "media_id")
      MediaIndexOps.compact(spark, path, "chunks", "media_id")
      assert(!ArtifactCache.hasVisibleParquet(new java.io.File(s"$path/chunks")),
        "an all-victim compaction must leave no posting behind")
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(path))
      ArtifactCache.deleteRecursively(new java.io.File(rb))
    }
  }

  test("compact phase B refuses a marker without the staged-rewrite lines " +
    "(foreign/corrupted marker must fail loudly, not half-apply)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-marker").toString
    try {
      val base = Seq((1L, 0x00ABCDEF012345L)).toDF("media_id", "phash")
      PerceptualHash.buildImageIndex(spark, base, path)
      MediaIndexOps.delete(spark, path, Seq(1L).toDF("media_id"), "media_id")
      new java.io.File(s"$path/deleted").mkdirs()
      java.nio.file.Files.write(
        new java.io.File(s"$path/deleted/.apply-commit").toPath,
        "some-tombstone-file.parquet".getBytes("UTF-8"))
      intercept[IllegalArgumentException] {
        MediaIndexOps.compactPhaseB(spark, path, "chunks", "media_id")
      }
    } finally ArtifactCache.deleteRecursively(new java.io.File(path))
  }

  test("compact resume AFTER the stage was retired (crash between stage " +
    "cleanup and marker delete) must not re-drop or truncate the " +
    "just-applied partitions") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-retire").toString
    try {
      val base = Seq((1L, 0x00F0F0F0F0F0F0L), (2L, 0x00F0F0F0F0F0F7L),
        (9L, 0x00111111111111L)).toDF("media_id", "phash")
      PerceptualHash.buildImageIndex(spark, base, path)
      MediaIndexOps.delete(spark, path, Seq(2L).toDF("media_id"), "media_id")
      assert(MediaIndexOps.compactPhaseA(spark, path, "chunks", "media_id"))
      // snapshot the marker, run phase B to completion, then put the
      // marker back — the exact on-disk state a crash leaves when it
      // lands after the stage's ATOMIC retirement but before the
      // marker delete (the stage can never be half-deleted: it is
      // renamed away in one atomic move before its files go)
      val marker = new java.io.File(s"$path/deleted/.apply-commit")
      val saved = java.nio.file.Files.readAllBytes(marker.toPath)
      MediaIndexOps.compactPhaseB(spark, path, "chunks", "media_id")
      val after = spark.read.parquet(s"$path/chunks")
        .select(col("media_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(after == Set(1L, 9L))
      new java.io.File(s"$path/deleted").mkdirs()
      java.nio.file.Files.write(marker.toPath, saved)
      MediaIndexOps.compactPhaseB(spark, path, "chunks", "media_id") // resume
      val resumed = spark.read.parquet(s"$path/chunks")
        .select(col("media_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(resumed == Set(1L, 9L),
        "a post-retirement resume must be a pure no-op on the postings")
      assert(!MediaIndexOps.pendingApply(path))
    } finally ArtifactCache.deleteRecursively(new java.io.File(path))
  }

  // --- letter-partitioned inverted index: delete lifecycle ---------------

  private def docLines = Tables.load(spark, sf, "documents")
    .select(col("doc_id").cast("int").as("file_id"), col("text").as("value"))

  test("IndexStore.delete equals a rebuild over the remaining corpus, " +
    "leaves untouched letters byte-identical, and an empty victim set " +
    "is a byte-level no-op") {
    val path = java.nio.file.Files.createTempDirectory("graft-tdel").toString
    val rb = java.nio.file.Files.createTempDirectory("graft-tdel-rb").toString
    try {
      val lines = docLines
      IndexStore.materialize(lines, s"$path/index")
      def letterMtimes(): Map[String, Long] =
        Option(new java.io.File(s"$path/index").listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("letter="))
          .flatMap(d => Option(d.listFiles()).toSeq.flatten
            .map(f => s"${d.getName}/${f.getName}" -> f.lastModified()))
          .toMap
      // empty victim set: nothing moves
      val m0 = letterMtimes()
      IndexStore.delete(spark, s"$path/index", lines.limit(0))
      assert(letterMtimes() == m0, "zero-victim delete must be a no-op")
      // real victims: every doc with file_id % 11 == 5
      val victims = lines.filter(col("file_id") % 11 === 5)
      val victimLetters = graft.operators.InvertedIndex.build(victims)
        .select(substring(col("word"), 1, 1).as("l")).distinct()
        .collect().map(_.getString(0)).toSet
      IndexStore.delete(spark, s"$path/index", victims)
      val m1 = letterMtimes()
      val untouched = m0.keySet.filter(
        k => !victimLetters.contains(k.split("/")(0).stripPrefix("letter=")))
      untouched.foreach { k =>
        assert(m1.get(k).contains(m0(k)),
          s"untouched letter file $k must not be rewritten")
      }
      IndexStore.materialize(lines.filter(col("file_id") % 11 =!= 5), s"$rb/index")
      def rows(p: String): Set[(String, Seq[Int])] =
        IndexStore.load(spark, p).collect()
          .map(r => (r.getAs[String]("word"),
            r.getAs[Seq[Int]]("file_ids"))).toSet
      assert(rows(s"$path/index") == rows(s"$rb/index"),
        "delete must equal the rebuild over the remaining corpus")
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(path))
      ArtifactCache.deleteRecursively(new java.io.File(rb))
    }
  }

  test("IndexStore delete+merge ≡ rebuild; a word and a letter whose every " +
    "posting was victims disappear like in a rebuild") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tdel2").toString
    val rb = java.nio.file.Files.createTempDirectory("graft-tdel2-rb").toString
    try {
      // letter 'z' exists ONLY in the victim doc; word "quill" shared
      val base = Seq(
        (1, "alpha quill zebra zoo"),
        (2, "alpha beta quill"),
        (3, "gamma delta")).toDF("file_id", "value")
      val delta = Seq((4, "epsilon alpha")).toDF("file_id", "value")
      IndexStore.materialize(base, s"$path/index")
      IndexStore.delete(spark, s"$path/index",
        base.filter(col("file_id") === 1))
      IndexStore.merge(spark, s"$path/index", delta)
      IndexStore.materialize(
        base.filter(col("file_id") =!= 1).union(delta), s"$rb/index")
      def rows(p: String): Set[(String, Seq[Int])] =
        IndexStore.load(spark, p).collect()
          .map(r => (r.getAs[String]("word"),
            r.getAs[Seq[Int]]("file_ids"))).toSet
      assert(rows(s"$path/index") == rows(s"$rb/index"))
      // zebra/zoo lived only in the victim: the whole letter dir is gone
      assert(!new java.io.File(s"$path/index/letter=z").exists(),
        "a letter emptied by the delete must be removed")
      assert(IndexStore.lookup(spark, s"$path/index", "quill").collect()
        .head.getSeq[Int](1).toList == List(2))
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(path))
      ArtifactCache.deleteRecursively(new java.io.File(rb))
    }
  }

  test("IndexStore maintenance crash-resume: reads refuse between the " +
    "phases, re-running the entry point converges to the identical end " +
    "state, and a new merge finishes a crashed delete first") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tcrash").toString
    val rb = java.nio.file.Files.createTempDirectory("graft-tcrash-rb").toString
    try {
      val base = Seq(
        (1, "alpha quill zebra"),
        (2, "alpha beta quill"),
        (3, "gamma delta")).toDF("file_id", "value")
      val delta = Seq((4, "epsilon alpha")).toDF("file_id", "value")
      IndexStore.materialize(base, s"$path/index")
      // crash a delete exactly between the phases: marker + stage only
      assert(IndexStore.deletePhaseA(spark, s"$path/index",
        base.filter(col("file_id") === 1)))
      assert(IndexStore.pendingMaintenance(s"$path/index"))
      intercept[IllegalStateException] {
        IndexStore.load(spark, s"$path/index").collect()
      }
      intercept[IllegalStateException] {
        IndexStore.lookup(spark, s"$path/index", "alpha").collect()
      }
      // a NEW op (the merge) inherits and finishes the crashed delete
      // before applying itself
      IndexStore.merge(spark, s"$path/index", delta)
      assert(!IndexStore.pendingMaintenance(s"$path/index"))
      IndexStore.materialize(
        base.filter(col("file_id") =!= 1).union(delta), s"$rb/index")
      def rows(p: String): Set[(String, Seq[Int])] =
        IndexStore.load(spark, p).collect()
          .map(r => (r.getAs[String]("word"),
            r.getAs[Seq[Int]]("file_ids"))).toSet
      assert(rows(s"$path/index") == rows(s"$rb/index"),
        "resumed delete + merge must equal the rebuild")
      assert(!new java.io.File(s"$path/index/letter=z").exists())
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(path))
      ArtifactCache.deleteRecursively(new java.io.File(rb))
    }
  }

  // --- persisted shingle store: takedown lifecycle ------------------------

  test("shingle store delete is exact immediately (df recomputed from live " +
    "postings), compact reclaims only victim buckets, decisions equal a " +
    "full recompute over the remaining corpus") {
    val docsAll = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val splitId = 400L
    val existing = docsAll.filter(col("doc_id") < splitId)
    val batch = docsAll.filter(col("doc_id") >= splitId)
    val path = java.nio.file.Files.createTempDirectory("graft-shdel").toString
    val rb = java.nio.file.Files.createTempDirectory("graft-shdel-rb").toString
    try {
      Dedup.buildShingleStore(spark, existing, path)
      val victims = existing.filter(col("doc_id") % 7 === 2).select(col("doc_id"))
      MediaIndexOps.delete(spark, path, victims, "doc_id")
      def decisions(idx: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
        Dedup.batchDedupDecisions(batch.select(col("doc_id")),
            Dedup.shingleHashes(batch, k = 2), idx, 0.3, 50)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // rebuild reference: store over existing \ victims
      Dedup.buildShingleStore(spark,
        existing.filter(col("doc_id") % 7 =!= 2), rb)
      val want = decisions(Dedup.liveShinglePostings(spark, rb))
      // EXACT pre-compaction: the tombstone anti-join feeds the df
      val preCompact = decisions(Dedup.liveShinglePostings(spark, path))
      assert(preCompact == want,
        "shingle takedown must be exact before any compaction")
      def bucketMtimes(): Map[String, Long] =
        Option(new java.io.File(s"$path/postings").listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("kb="))
          .flatMap(d => Option(d.listFiles()).toSeq.flatten
            .map(f => s"${d.getName}/${f.getName}" -> f.lastModified()))
          .toMap
      val m0 = bucketMtimes()
      val victimBuckets = victims
        .select(pmod(col("doc_id"), lit(Dedup.ShingleStoreBuckets)).as("b"))
        .distinct().collect().map(_.getLong(0)).toSet
      MediaIndexOps.compact(spark, path, "postings", "doc_id")
      val m1 = bucketMtimes()
      m0.keySet
        .filter(k => !victimBuckets.contains(
          k.split("/")(0).stripPrefix("kb=").toLong))
        .foreach(k => assert(m1.get(k).contains(m0(k)),
          s"untouched bucket file $k must not be rewritten"))
      assert(spark.read.parquet(s"$path/postings")
        .filter(col("doc_id") % 7 === 2).count() == 0,
        "compaction must physically remove victim postings")
      assert(decisions(Dedup.liveShinglePostings(spark, path)) == want)
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(path))
      ArtifactCache.deleteRecursively(new java.io.File(rb))
    }
  }

  test("IVF compaction crash-resume: probes refuse mid-swap, the staged " +
    "slice replays on resume, and a racing delete's tombstone survives") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-ivfcrash").toString
    try {
      graft.operators.IvfIndex.build(spark, sf, path)
      val e = graft.operators.Similarity.emb(spark, sf)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
          col("nrm").as("q_nrm"))
      val ids = graft.operators.IvfIndex.knn(spark, path, q, k = 2).collect()
        .map(_.getLong(2)).distinct.take(2)
      val Array(v1, v2) = ids
      graft.operators.IvfIndex.delete(spark, path, Seq(v1).toDF("vec_id"))
      // crash exactly between the phases: marker + staged slice only
      assert(graft.operators.IvfIndex.compactPhaseA(spark, path))
      assert(Takedown.pending(Takedown.IvfVectors, path))
      intercept[IllegalStateException] {
        graft.operators.IvfIndex.knn(spark, path, q, k = 5).collect()
      }
      // a delete racing the crashed compaction appends a NEW tombstone
      // file — absent from the marker, it must survive the resume
      graft.operators.IvfIndex.delete(spark, path, Seq(v2).toDF("vec_id"))
      graft.operators.IvfIndex.compact(spark, path) // resume
      assert(!Takedown.pending(Takedown.IvfVectors, path))
      assert(spark.read.parquet(s"$path/assigned")
        .filter(col("vec_id") === v1).count() == 0,
        "resumed compaction must finish the physical removal")
      val pend = spark.read.parquet(s"$path/deleted").collect()
        .map(_.getLong(0)).toSet
      assert(pend == Set(v2), s"racing tombstone must survive: $pend")
      val res = graft.operators.IvfIndex.knn(spark, path, q, k = 5).collect()
      assert(!res.exists(r => r.getLong(2) == v1 || r.getLong(2) == v2),
        "both victims must be invisible (one physical, one tombstoned)")
      graft.operators.IvfIndex.compact(spark, path)
      assert(spark.read.parquet(s"$path/assigned")
        .filter(col("vec_id") === v2).count() == 0)
    } finally ArtifactCache.deleteRecursively(new java.io.File(path))
  }

  // --- hv prune: victims' derived vectors leave the state -----------------

  test("compactState prunes takedown victims' hv vectors (derived data of " +
    "removed media must not persist), labels unchanged") {
    val path = java.nio.file.Files.createTempDirectory("graft-hvprune").toString
    try {
      val media = Multimodal.mediaTable(spark, sf)
        .select(col("media_id"), col("content"))
      val mid = media.agg(expr("percentile(media_id, 0.5)"))
        .head().getDouble(0).toLong
      MediaGroupsInc.ingest(spark, path, media.filter(col("media_id") < mid))
      MediaGroupsInc.ingest(spark, path, media.filter(col("media_id") >= mid))
      val victims = media.filter(pmod(col("media_id"), lit(7)) === 3)
        .select(col("media_id")).collect().map(_.getLong(0)).toSeq
      val labelsAfterDelete = MediaGroupsInc.delete(spark, path, victims)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // victims' vectors still on disk (inert) until the state compacts
      assert(new java.io.File(s"$path/.hv-prune-due").exists())
      MediaGroupsInc.compactState(spark, path)
      assert(!new java.io.File(s"$path/.hv-prune-due").exists())
      val hvIds = spark.read.parquet(s"$path/hv")
        .select(col("media_id")).distinct().collect().map(_.getLong(0)).toSet
      victims.foreach(v => assert(!hvIds.contains(v),
        s"victim $v's hv vector must be pruned by the compaction"))
      // and every live posting's media still has its vector
      val winIds = spark.read.parquet(s"$path/wins")
        .select(col("media_id")).distinct().collect().map(_.getLong(0)).toSet
      assert(winIds.subsetOf(hvIds),
        "the prune must keep every media with live postings")
      val labelsAfterCompact = MediaGroupsInc.currentLabels(spark, path)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labelsAfterCompact == labelsAfterDelete,
        "the hv prune must not change any answer")
    } finally ArtifactCache.deleteRecursively(new java.io.File(path))
  }

  // --- the Takedown facade: dispatch + refuse matrix -----------------------

  test("Takedown facade: posting-store dispatch tombstones like the family " +
    "entry point, and every pending-marker kind reads as pending and " +
    "refuses new deletes") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-facade").toString
    try {
      val base = Seq((1L, 0x00F0F0F0F0F0F0L), (2L, 0x00F0F0F0F0F0F7L))
        .toDF("media_id", "phash")
      PerceptualHash.buildImageIndex(spark, base, path)
      assert(!Takedown.pending(Takedown.ImageChunks, path))
      Takedown.delete(spark, Takedown.ImageChunks, path,
        Seq(2L).toDF("media_id"))
      assert(PerceptualHash.imageNearDupsAgainst(spark, path).collect().isEmpty,
        "facade delete must tombstone like MediaIndexOps.delete")
      // marker kind 1: mid-swap tombstone compaction. PROBES refuse;
      // a racing DELETE through the facade is explicitly permitted
      // (tombstone file absent from the marker → survives the resume)
      assert(MediaIndexOps.compactPhaseA(spark, path, "chunks", "media_id"))
      assert(Takedown.pending(Takedown.ImageChunks, path))
      intercept[IllegalStateException] {
        PerceptualHash.imageNearDupsAgainst(spark, path).collect()
      }
      Takedown.delete(spark, Takedown.ImageChunks, path,
        Seq(1L).toDF("media_id"))
      Takedown.compact(spark, Takedown.ImageChunks, path)
      assert(!Takedown.pending(Takedown.ImageChunks, path))
      // the racing tombstone survived the resumed compaction and still
      // masks image 1 until the NEXT compaction applies it
      assert(spark.read.parquet(s"$path/deleted").collect()
        .map(_.getLong(0)).toSet == Set(1L))
      Takedown.compact(spark, Takedown.ImageChunks, path)
      assert(!ArtifactCache.hasVisibleParquet(new java.io.File(s"$path/chunks")),
        "both images deleted: the store must be empty")
      // marker kind 2: mid-swap batch consolidation — probes refuse
      val consol = new java.io.File(s"$path/chunks/.consol-commit")
      java.nio.file.Files.write(consol.toPath, "sub:\nkeydf:".getBytes("UTF-8"))
      assert(Takedown.pending(Takedown.ImageChunks, path))
      intercept[IllegalStateException] {
        PerceptualHash.imageNearDupsAgainst(spark, path).collect()
      }
      consol.delete()
      // marker kind 3: mid-swap keydf compaction
      val kdc = new java.io.File(s"$path/keydf/.compact-commit")
      java.nio.file.Files.write(kdc.toPath, Array.emptyByteArray)
      assert(Takedown.pending(Takedown.ImageChunks, path))
      kdc.delete()
      assert(!Takedown.pending(Takedown.ImageChunks, path))
    } finally ArtifactCache.deleteRecursively(new java.io.File(path))
  }

  test("verifyErased: logical rows vanish at delete, physical rows at " +
    "compact, across a posting store, the group state, and the text index") {
    import spark.implicits._
    val ipath = java.nio.file.Files.createTempDirectory("graft-audit-i").toString
    val gpath = java.nio.file.Files.createTempDirectory("graft-audit-g").toString
    val tpath = java.nio.file.Files.createTempDirectory("graft-audit-t").toString
    try {
      def audit(m: Takedown.Modality, p: String,
          ids: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
        Takedown.verifyErased(spark, m, p, ids).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // --- posting store (image chunks): tombstone then compact
      val base = Seq((1L, 0x00F0F0F0F0F0F0L), (2L, 0x00F0F0F0F0F0F7L))
        .toDF("media_id", "phash")
      PerceptualHash.buildImageIndex(spark, base, ipath)
      val vic = Seq(2L).toDF("media_id")
      val before = audit(Takedown.ImageChunks, ipath, vic)("chunks")
      assert(before._1 > 0 && before._1 == before._2)
      Takedown.delete(spark, Takedown.ImageChunks, ipath, vic)
      val tomb = audit(Takedown.ImageChunks, ipath, vic)("chunks")
      assert(tomb._1 == 0, "tombstoned rows must be logically erased")
      assert(tomb._2 == before._2, "bytes remain until compaction")
      Takedown.compact(spark, Takedown.ImageChunks, ipath)
      assert(audit(Takedown.ImageChunks, ipath, vic)("chunks") == (0L, 0L))
      // --- group state: delete erases the probe surface; compactState
      //     reclaims the derived data (hv prune, pair rewrite, stale gens)
      val media = Multimodal.mediaTable(spark, sf)
        .select(col("media_id"), col("content"))
      val mid = media.agg(expr("percentile(media_id, 0.5)"))
        .head().getDouble(0).toLong
      MediaGroupsInc.ingest(spark, gpath, media.filter(col("media_id") < mid))
      MediaGroupsInc.ingest(spark, gpath, media.filter(col("media_id") >= mid))
      val gvic = media.filter(pmod(col("media_id"), lit(7)) === 3)
        .select(col("media_id"))
      val gvicIds = gvic.collect().map(_.getLong(0)).toSeq
      val g0 = audit(Takedown.MediaGroups, gpath, gvic)
      assert(g0("labels")._1 > 0 && g0("hv")._2 > 0)
      MediaGroupsInc.delete(spark, gpath, gvicIds)
      val g1 = audit(Takedown.MediaGroups, gpath, gvic)
      assert(g1("labels")._1 == 0, "deleted media must leave the live labels")
      assert(g1("wins")._2 == 0, "the delete rewrites victim postings out")
      assert(g1("hv")._2 > 0, "derived vectors persist until compactState")
      MediaGroupsInc.compactState(spark, gpath)
      val g2 = audit(Takedown.MediaGroups, gpath, gvic)
      assert(g2.values.forall(_ == (0L, 0L)),
        s"post-compaction audit must be all-zero: $g2")
      // --- text index: the delete is physical, one truth
      val lines = Seq((1, "alpha beta"), (2, "gamma"), (7, "alpha zeta"))
        .toDF("file_id", "value")
      IndexStore.materialize(lines, s"$tpath/index")
      val tvic = lines.filter(col("file_id") === 7)
      assert(audit(Takedown.TextIndex, s"$tpath/index",
        Seq(7L).toDF("id"))("index")._2 > 0)
      Takedown.delete(spark, Takedown.TextIndex, s"$tpath/index", tvic)
      assert(audit(Takedown.TextIndex, s"$tpath/index",
        Seq(7L).toDF("id"))("index") == (0L, 0L))
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(ipath))
      ArtifactCache.deleteRecursively(new java.io.File(gpath))
      ArtifactCache.deleteRecursively(new java.io.File(tpath))
    }
  }

  test("Takedown facade: group-state markers read as pending; TextIndex " +
    "victims must carry their content; every modality dispatches") {
    import spark.implicits._
    val gpath = java.nio.file.Files.createTempDirectory("graft-facade-g").toString
    val tpath = java.nio.file.Files.createTempDirectory("graft-facade-t").toString
    try {
      // group-state pending markers
      assert(!Takedown.pending(Takedown.MediaGroups, gpath))
      val del = new java.io.File(s"$gpath/.delete-commit")
      java.nio.file.Files.write(del.toPath, "ids:\n".getBytes("UTF-8"))
      assert(Takedown.pending(Takedown.MediaGroups, gpath))
      del.delete()
      val cmp = new java.io.File(s"$gpath/.compact-commit")
      java.nio.file.Files.write(cmp.toPath, "gen:0\n".getBytes("UTF-8"))
      assert(Takedown.pending(Takedown.MediaGroups, gpath))
      cmp.delete()
      // TextIndex: bare ids refuse (delete needs the victims' words)
      IndexStore.materialize(
        Seq((1, "alpha beta"), (2, "gamma")).toDF("file_id", "value"),
        s"$tpath/index")
      intercept[IllegalArgumentException] {
        Takedown.delete(spark, Takedown.TextIndex, s"$tpath/index",
          Seq(1).toDF("file_id"))
      }
      Takedown.delete(spark, Takedown.TextIndex, s"$tpath/index",
        Seq((1, "alpha beta")).toDF("file_id", "value"))
      assert(IndexStore.load(spark, s"$tpath/index").collect()
        .map(_.getAs[String]("word")).toSet == Set("gamma"))
      Takedown.compact(spark, Takedown.TextIndex, s"$tpath/index") // no-op
      assert(!Takedown.pending(Takedown.TextIndex, s"$tpath/index"))
    } finally {
      ArtifactCache.deleteRecursively(new java.io.File(gpath))
      ArtifactCache.deleteRecursively(new java.io.File(tpath))
    }
  }
}
