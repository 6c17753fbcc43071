package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-10 operators: per-domain cap, boilerplate-span coverage, and
  * the exact companions of the approximate percentile / heavy-hitter
  * families. Value-level equality vs DuckDB is the oracle gate's job;
  * these specs pin the invariants and the plan shapes that matter at
  * scale (partial agg instead of window, broadcast of the bounded
  * boilerplate set, TakeOrdered instead of a global sort).
  */
class Round10Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("domainCap keeps <=cap docs per source, ranked deterministically") {
    val cap = 15
    val out = Curation.domainCap(spark, sf, cap).cache()
    try {
      val perSource = out.groupBy("source")
        .agg(count(lit(1)).as("kept"), max("rnk").as("max_rnk"),
          min("rnk").as("min_rnk"), first("n_source_docs").as("n_docs"))
        .collect()
      assert(perSource.nonEmpty)
      perSource.foreach { r =>
        val kept = r.getLong(1); val maxR = r.getLong(2)
        val minR = r.getLong(3); val nDocs = r.getLong(4)
        assert(kept <= cap, s"source ${r.getString(0)} kept $kept > cap")
        assert(kept == math.min(cap.toLong, nDocs))
        assert(minR == 1L && maxR == kept, "rank sequence must be 1..kept")
      }
      // ranks agree with the window formulation (n_chars desc, doc_id asc)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val windowForm = Tables.load(spark, sf, "documents")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= cap)
        .select(col("source"), col("rnk"), col("doc_id"))
      assert(out.select("source", "rnk", "doc_id")
        .exceptAll(windowForm).isEmpty, "aggregator ranks diverge from window ranks")
      assert(windowForm.exceptAll(out.select("source", "rnk", "doc_id")).isEmpty)
    } finally out.unpersist()
  }

  test("domainCap plan aggregates partial per map task, no Window") {
    val plan = Curation.domainCap(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_"), s"no partial (map-side) stage in:\n$plan")
    assert(!plan.contains("Window"), s"window operator leaked into:\n$plan")
  }

  test("boilerplate coverage is a position union within per-doc bounds") {
    val docs = Tables.load(spark, sf, "documents").count()
    val out = TextQueries.boilerplate(spark, sf).cache()
    try {
      assert(out.count() == docs, "every document must report coverage")
      val bad = out.filter(
        col("n_covered") < 0 || col("n_covered") > col("n_tokens") ||
          col("boiler_frac") < 0 || col("boiler_frac") > 1).count()
      assert(bad == 0, "coverage outside [0, n_tokens]")
      // the top-gram set is genuinely frequent: some doc must be covered
      assert(out.agg(sum("n_covered")).collect()(0).getLong(0) > 0)
    } finally out.unpersist()
  }

  test("boilerplate probes the bounded gram set as a literal in-set, " +
    "never a gram-keyed shuffle join") {
    // r12: the top-k set is k driver-side literals, so the probe is a
    // codegen in-set FILTER — stronger than the broadcast join it
    // replaced (no join, no cached gram blocks, no checkpoint residue)
    val plan = TextQueries.boilerplate(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"no literal in-set gram probe in:\n$plan")
    // the only join left is the doc_id re-attach; nothing joins on gram
    assert(!plan.contains("[gram"), s"gram-keyed join in:\n$plan")
  }

  test("topTokensExact matches an independent count and bounds the sketch") {
    val exact = TextQueries.topTokensExact(spark, sf, 50).collect()
    assert(exact.nonEmpty)
    // descending counts, token-asc tiebreak
    exact.sliding(2).foreach {
      case Array(a, b) =>
        val (na, nb) = (a.getLong(1), b.getLong(1))
        assert(na > nb || (na == nb && a.getString(0) < b.getString(0)))
      case _ =>
    }
    // CMS never underestimates: every exact heavy hitter the sketch
    // reports must carry est_count >= exact count
    val est = graft.SparkEntry.queries("q_heavy_hitters")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val covered = exact.filter(r => est.contains(r.getString(0)))
    assert(covered.nonEmpty, "sketch and exact top-k share no tokens")
    covered.foreach { r =>
      assert(est(r.getString(0)) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}")
    }
  }

  test("boilerplateStrip keeps exactly the uncovered positions") {
    val cov = TextQueries.boilerplate(spark, sf)
      .select(col("doc_id"), col("n_tokens"), col("n_covered"))
    val strip = TextQueries.boilerplateStrip(spark, sf)
      .select(col("doc_id"), col("n_tokens").as("nt2"), col("n_kept"), col("clean_fp"))
    val joined = cov.join(strip, Seq("doc_id")).cache()
    try {
      assert(joined.count() == Tables.load(spark, sf, "documents").count())
      // kept + covered = total, per doc, across the two independent paths
      val bad = joined.filter(
        col("n_tokens") =!= col("nt2") ||
          col("n_kept") + col("n_covered") =!= col("n_tokens")).count()
      assert(bad == 0, "kept + covered != total tokens")
      // a fully-uncovered doc's fingerprint equals md5 of its normalized text
      val fps = joined.filter(col("n_covered") === 0).limit(1).collect()
      fps.foreach { r =>
        val docId = r.getLong(0)
        val norm = Tables.load(spark, sf, "documents")
          .filter(col("doc_id") === docId)
          .select(md5(concat_ws(" ",
            filter(transform(split(col("text"), "\\s+"),
              t => operators.InvertedIndex.normalizeToken(t)),
              w => length(w) > 0))).as("fp"))
          .collect()(0).getString(0)
        assert(r.getString(5) == norm, "untouched doc fingerprint diverged")
      }
    } finally joined.unpersist()
  }

  test("histogramRollup lands in the bucket of the true order statistic") {
    val est = TrainingPrep.histogramRollup(spark, sf).collect()
    assert(est.nonEmpty)
    // per (week, type): the ceil(p*n)-th smallest raw value must share
    // the estimate's 5.0-wide bucket — the histogram's exact guarantee
    val raw = Tables.load(spark, sf, "events")
      .select(weekofyear(to_date(col("ts"))).cast("long").as("week"),
        col("event_type"), col("value"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .view.mapValues(_.map(_.getDouble(2)).sorted).toMap
    est.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      val vs = raw(key)
      assert(r.getLong(2) == vs.length, s"n_events mismatch for $key")
      Seq(0.5 -> 3, 0.9 -> 4, 0.99 -> 5).foreach { case (p, i) =>
        val h = r.getDouble(i)
        val k = math.ceil(p * vs.length).toInt.max(1)
        val trueVal = vs(k - 1)
        assert(math.abs(h - trueVal) <= 5.0 + 1e-9,
          s"$key p=$p: est $h not within one bucket of order stat $trueVal")
      }
    }
  }

  test("hardNegatives: label-disjoint, window-form parity, no corpus-wide window") {
    val out = Similarity.hardNegatives(spark, sf).cache()
    try {
      // every mined negative's label differs from the query's
      val e = Tables.load(spark, sf, "embeddings")
        .select(col("vec_id").as("neighbor_id"), col("label").as("n_label"))
      assert(out.join(e, Seq("neighbor_id"))
        .filter(col("n_label") === col("q_label")).count() == 0,
        "a hard negative shares the query's label")
      // parity with the window formulation on the same scored set
      import org.apache.spark.sql.expressions.Window
      val eAll = Similarity.emb(spark, sf)
      val q = eAll.select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_label"))
        .filter(col("query_id") < 10)
      val scored = eAll.join(broadcast(q),
          col("vec_id") =!= col("query_id") && col("label") =!= col("q_label"))
        .withColumn("cos", graft.functions.Rounding.portableRound4(
          graft.functions.VectorFunctions.arrayDot(col("emb"), col("q_emb"))
            / (col("nrm") * col("q_nrm"))))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      val windowForm = scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("q_label"), col("rnk"),
          col("vec_id").as("neighbor_id"), col("cos"))
      assert(out.exceptAll(windowForm).isEmpty &&
        windowForm.exceptAll(out).isEmpty, "aggregator diverges from window form")
      // and the shipped plan has no Window operator
      val plan = Similarity.hardNegatives(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"corpus-wide window leaked into:\n$plan")
    } finally out.unpersist()
  }

  test("seqExamples: contexts are the true preceding event types") {
    val out = EventsQueries.seqExamples(spark, sf).collect()
    assert(out.nonEmpty)
    // rebuild each user's ordered history and check every emitted pair
    val hist = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        .map(_.getString(3)).toVector).toMap
    out.foreach { r =>
      val (u, pos, context, target) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
      val h = hist(u)
      assert(pos >= 2 && pos <= h.length)
      assert(h(pos.toInt - 1) == target, s"target mismatch at $u/$pos")
      val want = h.slice(math.max(0, pos.toInt - 4), pos.toInt - 1).mkString(" ")
      assert(context == want, s"context mismatch at $u/$pos: '$context' vs '$want'")
    }
    // every user with n events yields exactly n-1 examples
    val perUser = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    hist.foreach { case (u, h) =>
      assert(perUser.getOrElse(u, 0) == h.length - 1, s"example count off for $u")
    }
  }

  test("streaming histogram maintenance == batch rollup, replay-idempotent") {
    // four files -> four micro-batches (build on 0, merge on 1..3)
    val staged = java.nio.file.Files.createTempDirectory("graft-hist-src").toString
    Tables.load(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .repartition(4).write.mode("overwrite").parquet(staged)
    val parent = java.nio.file.Files.createTempDirectory("graft-hist").toString
    val path = s"$parent/daily"
    // leftover table at the output path: must be overwritten, not merged
    operators.TrainingPrep.dailyHistogram(
        Tables.load(spark, sf, "events").limit(50))
      .write.mode("overwrite").parquet(path)
    val src = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = graft.streaming.EventStream.maintainHistogram(src, path)
    try q.processAllAvailable() finally q.stop()
    val served = operators.TrainingPrep.histogramPercentiles(
      spark.read.parquet(path)).collect().map(_.toSeq)
    val direct = operators.TrainingPrep.histogramRollup(spark, sf)
      .collect().map(_.toSeq)
    assert(served.length == direct.length && served.nonEmpty)
    served.zip(direct).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    // replay simulation: rebuilding over unchanged staged partials
    // leaves the table identical
    val staging = new java.io.File(parent).listFiles()
      .map(_.toString).filter(_.contains("daily.batches-")).head
    graft.streaming.EventStream.rebuildHistogram(spark, staging, path)
    val again = operators.TrainingPrep.histogramPercentiles(
      spark.read.parquet(path)).collect().map(_.toSeq)
    assert(again.toSeq == served.toSeq, "rebuild over unchanged partials drifted")
  }

  test("containmentDups: overlap >= jaccard, planted excerpt found at 1.0") {
    // containment can never be below jaccard for the same pair
    val j = Dedup.ngramJaccardDups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val c = Dedup.containmentDups(spark, sf, threshold = 0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val shared = j.keySet.intersect(c.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(c(k) >= j(k) - 1e-9, s"overlap < jaccard at $k"))
    // a planted strict excerpt: doc B = first tokens of doc A -> the
    // pair must surface with containment 1.0 and B as contained_doc
    import spark.implicits._
    val base = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(1).collect()(0)
    val full = base.getString(1)
    val excerpt = full.split("\\s+").take(8).mkString(" ")
    val planted = Seq((900000L, full), (900001L, excerpt)).toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(planted, k = 2)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(inter == sizes(900001L),
      "every excerpt shingle must be contained in the full doc")
  }

  test("mixtureTemperature flattens shares: boosts small sources, sums to 1") {
    val rows = DatasetOps.mixtureTemperature(spark, sf).collect()
    assert(rows.nonEmpty)
    val natural = rows.map(_.getDouble(3))
    val temp = rows.map(_.getDouble(4))
    assert(math.abs(natural.sum - 1.0) < 1e-2 && math.abs(temp.sum - 1.0) < 1e-2)
    // T < 1 compresses the distribution: the spread of temperature
    // shares is strictly smaller, and every below-average source is
    // boosted (boost > 1) while every above-average one is damped
    assert(temp.max - temp.min < natural.max - natural.min + 1e-9)
    // TRUE invariants of p^(T-1)/z (the damping crossover is z^(-1/(1-T)),
    // NOT the mean share — an average-share test would fail on valid
    // skewed corpora): boost is strictly decreasing in p, the smallest
    // share is never damped, the largest never boosted
    val byShare = rows.sortBy(_.getDouble(3))
    byShare.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getDouble(3) < b.getDouble(3) - 1e-12)
          assert(a.getDouble(5) >= b.getDouble(5) - 1e-9,
            "boost must decrease with natural share")
      case _ =>
    }
    assert(byShare.head.getDouble(5) >= 1.0 - 1e-4, "smallest share damped")
    assert(byShare.last.getDouble(5) <= 1.0 + 1e-4, "largest share boosted")
  }

  test("kNN family plans carry no per-query Window (bounded-heap top-k)") {
    Seq(
      "brute" -> Similarity.knnBruteForce(spark, sf),
      "sq8" -> Similarity.knnSq8(spark, sf)).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plan regressed to a per-query window:\n$plan")
      assert(plan.contains("ObjectHashAggregate"), s"$name lost the heap aggregate")
    }
    // ivf keeps ONE window: probe-cell selection, partitioned per query
    // over the ≤4096-row centroid table (bounded model state, and Spark
    // inserts WindowGroupLimit). The corpus-side top-k must still be
    // the heap aggregate.
    val ivf = Similarity.knnIvf(spark, sf).queryExecution.executedPlan.toString
    assert(ivf.contains("ObjectHashAggregate"), "ivf lost the heap aggregate")
    assert(ivf.contains("WindowGroupLimit"),
      "ivf probe selection lost its group-limit pushdown")
  }

  test("posting codec: exact roundtrip (codegen and interpreted), dense lists compress") {
    import graft.functions.PostingCodec
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // property: roundtrip over adversarial shapes — empty, single,
    // unsorted, negatives, Long extremes, long dense runs
    val cases: Seq[Array[Long]] = Seq(
      Array.empty[Long], Array(0L), Array(-1L), Array(Long.MaxValue),
      Array(Long.MinValue, Long.MaxValue, 0L, -5L, 5L),
      (0L until 1000L).toArray, (0L until 1000L).map(_ * 7 + 3).toArray,
      Array(9L, 3L, 7L, 1L))
    cases.foreach { c =>
      val enc = PostingCodec.encode(new GenericArrayData(c))
      val dec = PostingCodec.decode(enc).toLongArray()
      assert(dec.toSeq == c.toSeq, s"roundtrip failed for ${c.toSeq.take(5)}...")
    }
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val c = Array.fill(rnd.nextInt(50))(rnd.nextLong())
      val dec = PostingCodec.decode(
        PostingCodec.encode(new GenericArrayData(c))).toLongArray()
      assert(dec.toSeq == c.toSeq)
    }
    // dense ascending lists must beat 8 B/posting decisively
    val dense = (0L until 10000L).toArray
    val bytes = PostingCodec.encode(new GenericArrayData(dense)).length
    assert(bytes < dense.length * 2, s"dense list not compressed: $bytes bytes")
    // the DataFrame path (codegen) agrees with the direct calls, and
    // every posting list in the corpus round-trips
    val out = TextQueries.postingCompression(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(5) == r.getLong(1), s"roundtrip failures in ${r.getString(0)}")
      assert(r.getLong(4) < r.getLong(3), "encoded must be smaller than raw")
    }
  }

  test("compactStaging: one data dir after, rebuild identical, replay skip intact, crash-resumable") {
    import graft.streaming.EventStream
    val staged = java.nio.file.Files.createTempDirectory("graft-hist-csrc").toString
    Tables.load(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .repartition(4).write.mode("overwrite").parquet(staged)
    val parent = java.nio.file.Files.createTempDirectory("graft-hist-c").toString
    val path = s"$parent/daily"
    val src = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = EventStream.maintainHistogram(src, path)
    try q.processAllAvailable() finally q.stop()
    val staging = new java.io.File(parent).listFiles()
      .map(_.toString).filter(_.contains("daily.batches-")).head
    val before = operators.TrainingPrep.histogramPercentiles(
      spark.read.parquet(path)).collect().map(_.toSeq).toSeq

    def dataDirs() = new java.io.File(staging).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("batch="))
      .filter(d => d.listFiles().exists(_.getName.endsWith(".parquet")))
    assert(dataDirs().length > 1, "expected multiple staged batches")

    EventStream.compactStaging(spark, staging)
    assert(dataDirs().length == 1, "compaction must leave one data dir")
    // every original batch dir keeps its replay-skip marker
    new java.io.File(staging).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("batch="))
      .foreach(d => assert(new java.io.File(d, "_SUCCESS").exists(),
        s"replay marker lost in ${d.getName}"))
    // the rebuilt serving table is unchanged
    EventStream.rebuildHistogram(spark, staging, path)
    val after = operators.TrainingPrep.histogramPercentiles(
      spark.read.parquet(path)).collect().map(_.toSeq).toSeq
    assert(after == before, "compaction changed the served rollup")

    // crash simulation: a SECOND stream appends two more batches, then
    // compaction "crashes" right after the commit marker (phase A done,
    // phase B not run); the re-run must resume to the same end state
    val staged2 = java.nio.file.Files.createTempDirectory("graft-hist-csrc2").toString
    Tables.load(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(col("ts"), col("event_type"), col("value"))
      .repartition(2).write.mode("overwrite").parquet(staged2)
    val src2 = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged2)
    // reuse the same staging dir via an explicit checkpoint key
    val q2 = EventStream.maintainHistogram(src2, path,
      checkpointLocation = None)
    try q2.processAllAvailable() finally q2.stop()
    val staging2 = new java.io.File(parent).listFiles()
      .map(_.toString).filter(_.contains("daily.batches-"))
      .filterNot(_ == staging).head
    // phase A by hand = the crash point: temp written, marker committed
    // (the marker records the keep target AND the merged dir set)
    val root = new java.io.File(staging2)
    val dirs = root.listFiles().filter(d =>
      d.isDirectory && d.getName.startsWith("batch=") &&
        new java.io.File(d, "_SUCCESS").exists())
    if (dirs.length > 1) {
      val tmp = new java.io.File(root, ".compact-tmp")
      spark.read.parquet(dirs.map(_.getPath).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(tmp.getPath)
      val keepName = s"batch=${dirs.map(_.getName.stripPrefix("batch=").toLong).max}"
      java.nio.file.Files.write(new java.io.File(root, ".compact-commit").toPath,
        (keepName +: dirs.map(_.getName).toSeq).mkString("\n").getBytes("UTF-8"))
      // a stream restarted between the crash and the resume stages a NEW
      // batch — absent from the temp merge, it must survive the resume
      val lateId = dirs.map(_.getName.stripPrefix("batch=").toLong).max + 7
      val lateDir = s"$staging2/batch=$lateId"
      operators.TrainingPrep.dailyHistogram(
        Tables.load(spark, sf, "events")
          .filter(col("event_type") === "view")
          .select(col("ts"), col("event_type"), col("value")))
        .write.mode("overwrite").parquet(lateDir)
      val expected = spark.read.parquet(
        (dirs.map(_.getPath) :+ lateDir).toIndexedSeq: _*)
        .select(col("event_date"), col("event_type"), col("bucket"), col("cnt"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      // resume from the crash point
      EventStream.compactStaging(spark, staging2)
      val resumed = spark.read.parquet(staging2)
        .select(col("event_date"), col("event_type"), col("bucket"), col("cnt"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(resumed == expected,
        "crash-resumed compaction lost or duplicated partials " +
          "(late-staged batch must survive the resume strip)")
      assert(new java.io.File(lateDir).listFiles()
        .exists(_.getName.endsWith(".parquet")),
        "resume stripped a batch dir that was never merged")
      assert(!new java.io.File(root, ".compact-commit").exists())
      assert(!new java.io.File(root, ".compact-tmp").exists())
    }
  }

  test("labelCentroids: cohesion bounds, and unit-member identity avg_cos == |c|") {
    val rows = Similarity.labelCentroids(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nrm, avg, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= avg && avg <= mx, s"avg outside [min, max]: $r")
      assert(mx <= 1.0 + 1e-9 && mn >= -1.0 - 1e-9)
      // for unit-norm members, mean member-to-centroid cosine equals
      // the centroid's norm exactly: (1/n)Σ mᵢ·c/|c| = c·c/|c| = |c|.
      // The fixture embeddings are unit vectors, so the two published
      // stats must agree to rounding.
      assert(math.abs(avg - nrm) < 2e-4,
        s"avg_cos $avg != centroid_norm $nrm for unit members: $r")
    }
    // every vector's label appears
    assert(rows.map(_.getLong(1)).sum ==
      Tables.load(spark, sf, "embeddings").count())
  }

  test("valueOutliers: fences bracket the IQR, counts match a local recount") {
    val rows = EventsQueries.valueOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val t = r.getString(0)
      val vs = raw(t)
      assert(r.getLong(1) == vs.length)
      val (q1r, q3r, lo, hi) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(q1r <= q3r && lo <= q1r && q3r <= hi)
      // recount outliers against locally recomputed interpolated quartiles
      def quant(p: Double): Double = {
        val pos = p * (vs.length - 1)
        val lo = pos.toInt; val frac = pos - lo
        if (lo + 1 < vs.length) vs(lo) * (1 - frac) + vs(lo + 1) * frac else vs(lo)
      }
      val (q1, q3) = (quant(0.25), quant(0.75))
      val (loF, hiF) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      val n = vs.count(v => v < loF || v > hiF)
      assert(r.getLong(6) == n, s"outlier count mismatch for $t: ${r.getLong(6)} vs $n")
    }
  }

  test("indexDiff: added/removed/changed statuses each fire correctly") {
    import spark.implicits._
    val oldDocs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta"))
      .toDF("doc_id", "text")
    val newDocs = Seq((1L, "alpha beta delta"), (2L, "alpha delta"))
      .toDF("doc_id", "text")
    val diff = TextQueries.indexDiffOn(newDocs, oldDocs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // delta: absent before, df 2 now -> added; gamma: gone -> removed;
    // beta: df 2 -> 1 -> changed; alpha: df 2 == 2 -> filtered out
    assert(diff("delta") == ((0L, 2L, "added")))
    assert(diff("gamma") == ((1L, 0L, "removed")))
    assert(diff("beta") == ((2L, 1L, "changed")))
    assert(!diff.contains("alpha"), "unchanged word must be filtered")
    // gate form: every reported row genuinely moved
    TextQueries.indexDiff(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) != r.getLong(2))
    }
  }

  test("histogram maintenance resumes across a checkpointed restart") {
    import graft.streaming.EventStream
    val srcDir = java.nio.file.Files.createTempDirectory("graft-hist-rsrc").toString
    val parent = java.nio.file.Files.createTempDirectory("graft-hist-r").toString
    val path = s"$parent/daily"
    val ckpt = s"$parent/ckpt"
    val events = Tables.load(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
    // first half of the stream, then stop
    events.filter(col("event_type").isin("click", "view"))
      .repartition(2).write.mode("overwrite").parquet(srcDir)
    def start() = EventStream.maintainHistogram(
      spark.readStream
        .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      path, checkpointLocation = Some(ckpt))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // new files arrive while the stream is down; the restart must pick
    // up ONLY those (checkpoint offsets) and land them in the SAME
    // staging dir (runKey derives from the checkpoint, not the start)
    events.filter(!col("event_type").isin("click", "view"))
      .repartition(2).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val stagings = new java.io.File(parent).listFiles()
      .map(_.getName).filter(_.startsWith("daily.batches-"))
    assert(stagings.length == 1,
      s"restart must reuse the checkpoint-keyed staging dir, got ${stagings.toSeq}")
    // serving view == one-shot batch rollup over ALL events
    val served = operators.TrainingPrep.histogramPercentiles(
      spark.read.parquet(path)).collect().map(_.toSeq).toSeq
    val direct = operators.TrainingPrep.histogramRollup(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served == direct, "resumed maintenance diverged from the batch rollup")
  }

  test("hourlyRateGapFilled: planted gaps appear as zero-count hours") {
    import spark.implicits._
    // events at hours 0, 1, and 4 — hours 2 and 3 are genuine gaps
    val sparse = Seq(
      "2024-03-01 00:10:00", "2024-03-01 00:50:00",
      "2024-03-01 01:30:00", "2024-03-01 04:05:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
    val out = EventsQueries.hourlyRateGapFilledOn(sparse).collect()
    assert(out.length == 5, s"span 00..04 must yield 5 hours, got ${out.length}")
    val byHour = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byHour == Map(0L -> 2L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
    // conservation on the real table: gap-filled totals == raw count
    val total = EventsQueries.hourlyRateGapFilled(spark, sf)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.load(spark, sf, "events").count())
  }

  test("percentilesExact is monotone and brackets the approx answers") {
    val rows = Relational.percentilesExact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p75, p90) = (2 to 5).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90, s"non-monotone: $r")
    }
    // approx_percentile(accuracy=1000)'s median is a real element near
    // the exact interpolated median
    val approx = Relational.approxPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val p50 = r.getDouble(3)
      val a = approx(r.getString(0))
      assert(math.abs(a - p50) / p50 < 0.10, s"approx median $a far from exact $p50")
    }
  }
}
