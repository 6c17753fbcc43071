package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Behavior specs for the round-8 additions: BM25 ranking, exact-pair
  * connected-component dup groups, balanced stratified sampling, and
  * SCD-2 state intervals. Value-level parity with DuckDB is covered by
  * the oracle gate; these pin the semantic invariants the oracle hash
  * can't express (transitivity, interval contiguity, exact stratum
  * sizes) and the plan shapes that matter at scale.
  */
class Round8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ BM25

  test("bm25: scores positive, ranked desc, and every hit contains a query term") {
    val res = TextQueries.bm25Search(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 10)
    val scores = res.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-_)), "not sorted by score desc")
    val hitIds = res.map(_.getLong(0)).toSet
    val q = Set("spark", "join", "window")
    val withTerm = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .select(col("doc_id"), InvertedIndex.normalizeToken(col("tok")).as("w"))
      .filter(col("w").isin(q.toSeq: _*))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm), "a scored doc contains no query term")
  }

  test("bm25: small sides broadcast, no shuffle beyond the tf aggregate") {
    val plan = TextQueries.bm25Search(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"df/stats sides not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("bm25: length normalization ranks shorter docs above longer at equal tf") {
    // saturation sanity on a constructed corpus: same tf, different dl
    import spark.implicits._
    val d = Seq(
      (1L, "spark " * 2 + "alpha " * 3),   // dl 5, tf 2
      (2L, "spark " * 2 + "alpha " * 48)   // dl 50, tf 2
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25docs")
    d.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    val res = TextQueries.bm25Search(spark, tmp.toString, query = Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res(1L) > res(2L), s"short doc should outrank long: $res")
  }

  // ------------------------------------- exact-pair dup groups (CC)

  test("ngramDupGroups: groups are the transitive closure of ngram pairs") {
    val pairs = Dedup.ngramJaccardDups(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = Dedup.ngramDupGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // union-find over the collected pairs (tiny at sf0.001)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.groupBy(find)
      .map { case (_, ms) => (ms.min, ms.size.toLong, ms.max) }.toSet
    assert(groups.toSet == expected,
      s"CC mismatch: got ${groups.toSet}, want $expected")
    assert(groups.nonEmpty, "sf0.001 corpus should contain at least one dup group")
  }

  // ------------------------------------------- stratified sampling

  test("stratifiedSample: every stratum is cut to exactly the min class size") {
    val rows = DatasetOps.stratifiedSample(spark, sf).collect()
    val minClass = rows.map(_.getLong(1)).min
    rows.foreach { r =>
      assert(r.getLong(2) == minClass,
        s"lang ${r.getString(0)}: n_sampled ${r.getLong(2)} != min class $minClass")
    }
  }

  test("stratifiedSample: membership matches the portable hash rank recomputed locally") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val p = 1000003L
    def hkey(id: Long) = ((id % p) * (2654435761L % p)) % p
    val byLang = docs.groupBy(_._2)
    val m = byLang.values.map(_.size).min
    val expected = byLang.map { case (lang, ds) =>
      lang -> ds.map(_._1).sortBy(id => (hkey(id), id)).take(m).sum
    }
    DatasetOps.stratifiedSample(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) == expected(r.getString(0)),
        s"lang ${r.getString(0)}: sampled_sum ${r.getLong(3)} != ${expected(r.getString(0))}")
    }
  }

  // ------------------------------------------------- SCD-2 intervals

  test("scd2: intervals are contiguous, states alternate, events conserved") {
    val iv = EventsQueries.scd2States(spark, sf).collect()
    val byUser = iv.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // exactly one open interval (the current state), and it is last
      assert(sorted.init.forall(!_.isNullAt(5)), s"user $u: non-final open interval")
      assert(sorted.last.isNullAt(5), s"user $u: final interval not open")
      // contiguity: valid_to(i) == valid_from(i+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) == b.getLong(4),
            s"user $u: gap between runs ${a.getLong(1)} and ${b.getLong(1)}")
          assert(a.getString(2) != b.getString(2),
            s"user $u: consecutive runs share state ${a.getString(2)}")
        case _ => ()
      }
    }
    // event conservation: interval n_events sums to the table's per-user counts
    val total = iv.map(_.getLong(3)).sum
    assert(total == Tables.load(spark, sf, "events").count(),
      "sum of interval n_events != total events")
  }

  test("scd2: single shuffle on user_id (both windows share the partitioning)") {
    val plan = EventsQueries.scd2States(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges (user_id + final agg), got $exchanges:\n$plan")
  }

  // --------------------------------------------------- SQ8 kNN + PMI

  test("knnSq8: int8 quantize + exact rerank equals brute force bit-for-bit") {
    val brute = Similarity.knnBruteForce(spark, sf).collect().toSeq
    val sq8 = Similarity.knnSq8(spark, sf).collect().toSeq
    assert(sq8 == brute, "SQ8+rerank must reproduce the exact top-k")
  }

  test("knnSq8: survives a tiny rerank pool down to k (ordering only degrades, never errors)") {
    // with rerank = k the pool IS the answer set by approx score; the
    // result is k rows per query with exact cosines, sorted
    val res = Similarity.knnSq8(spark, sf, k = 5, rerank = 5).collect()
    val byQ = res.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 5)
      val cs = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.sameElements(cs.sortBy(-(_: Double))), "cos not desc by rank")
    }
  }

  test("pmi: counts consistent, independence baseline, and adjacency bound") {
    val res = TextQueries.pmiCollocations(spark, sf, minCount = 2).collect()
    assert(res.nonEmpty, "expected some repeated bigrams at sf0.001")
    res.foreach { r =>
      val (cab, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // a pair can't co-occur more often than either member occurs
      assert(cab <= ca && cab <= cb, s"pair count exceeds member count: $r")
      assert(cab >= 2)
    }
    // PMI must rank a pair that ALWAYS co-occurs above one that never
    // does beyond chance: verify sign behavior on the extremes present
    val pmis = res.map(_.getDouble(5))
    assert(pmis.max > 0.0, "no positive-PMI collocation found")
  }

  test("pmi: no window and no self-join in the plan (two aggs + vocab joins)") {
    val plan = TextQueries.pmiCollocations(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }

  // ------------------------------------------------------- reconcile

  private def portableHash(id: Long): Long = ((id % 1000003L) * (2654435761L % 1000003L)) % 1000003L

  test("reconcile: identical snapshots match on every bucket") {
    val ev = Tables.load(spark, sf, "events")
    val d = Reconcile.diff(ev, ev, "event_id").collect()
    assert(d.nonEmpty && d.forall(_.getString(5) == "match"))
  }

  test("reconcile: scattered row loss flags exactly the buckets holding lost rows") {
    val ids = Tables.load(spark, sf, "events")
      .select(col("event_id")).collect().map(_.getLong(0))
    val lostBuckets = ids.filter(_ % 97 == 13).map(portableHash(_) % 64).toSet
    val d = Reconcile.snapshotDiff(spark, sf).collect()
    val flagged = d.filter(_.getString(5) != "match").map(_.getLong(0)).toSet
    assert(flagged == lostBuckets, s"flagged $flagged vs expected $lostBuckets")
    // and the per-bucket count deltas sum to the number of lost rows
    val delta = d.map(r => r.getLong(1) - r.getLong(2)).sum
    assert(delta == ids.count(_ % 97 == 13))
  }

  test("reconcile: equal-count membership drift is caught by checksum, not count") {
    import spark.implicits._
    // two ids in the SAME bucket with DIFFERENT row hashes: swapping one
    // for the other keeps n identical, only the checksum moves
    val id1 = 1L
    val b1 = portableHash(id1) % 64
    val id2 = (2L to 100000L).find(i =>
      portableHash(i) % 64 == b1 && portableHash(i) != portableHash(id1)).get
    val a = Seq(id1, 7L, 9L).toDF("event_id")
    val b = Seq(id2, 7L, 9L).toDF("event_id")
    val d = Reconcile.diff(a, b, "event_id").collect()
    val drifted = d.filter(_.getString(5) == "checksum_diff")
    assert(drifted.length == 1 && drifted.head.getLong(0) == b1)
    assert(d.forall(_.getString(5) != "count_diff"))
  }

  // ------------------------------------------- bounded-heap top-k UDAF

  test("topk heap: byte-identical to the window variant") {
    val win = Relational.topOrdersPerSegment(spark, sf).collect().toSeq
    val agg = Relational.topOrdersPerSegmentAgg(spark, sf).collect().toSeq
    assert(win.nonEmpty && agg == win,
      s"heap=${agg.take(5)} window=${win.take(5)}")
  }

  test("topk heap plan: partial ObjectHashAggregate, no Window operator") {
    val plan = Relational.topOrdersPerSegmentAgg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_"),
      s"no map-side partial stage (shuffle carries raw rows) in:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked into heap plan:\n$plan")
  }

  test("topk aggregator: reduce/merge ≡ global sort-take under any split") {
    val k = 5
    val agg = new graft.functions.TopKAggregator(k)
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { trial =>
      // unique ids (the o_orderkey contract); scores drawn from a small
      // range so cross-chunk ties exercise the id tie-break
      val xs = Seq.tabulate(1 + rnd.nextInt(60))(i =>
        graft.functions.ScoredId(rnd.nextInt(8).toDouble, i.toLong))
      val expect = xs.sortBy(x => (-x.score, x.id)).take(k)
      // random chunking + random merge order must not change the result
      val shuffled = rnd.shuffle(xs)
      val chunks = shuffled.grouped(1 + rnd.nextInt(7)).toSeq
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expect, s"trial $trial diverged")
    }
  }

  // ------------------------------------------------- PII redaction

  test("pii redaction: known counts and ordered replacement on a constructed corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "contact alice.b+test@ex-ample.co.uk or bob@x.io today"),
      (2L, "server 10.0.255.1 and 192.168.1.1 up; call +1 (555) 867-5309 now"),
      (3L, "account 1234 5678 9012 3456 closed"),
      (4L, "clean text with only words and a short 123 number"),
      // an email whose digits must NOT double-count as a digit run,
      // and an IP glued to punctuation (boundary still matches)
      (5L, "mail 12345678@digits.example, host (127.0.0.1).")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("redact").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Redaction.redactDocuments(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ((2, 0, 0)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((0, 2, 1)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((0, 0, 1)), s"doc3 ${got(3L)}")
    assert(got(4L) == ((0, 0, 0)), s"doc4 ${got(4L)}")
    assert(got(5L) == ((1, 1, 0)), s"doc5 ${got(5L)}")
  }

  test("pii redaction plan: one codegen projection over the scan, no shuffle") {
    val df = Redaction.redactDocuments(spark, sf)
    df.collect() // AQE: finalize so the plan string shows codegen stages
    // keep only the final plan (the adaptive toString repeats the
    // initial plan below it, double-counting the one Exchange)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the only exchange allowed is the final presentation sort's
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 1, s"redaction shuffled more than the output sort:\n$plan")
    // codegen stages render as "*(n)" in the finalized adaptive plan
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"regex stage fell out of codegen:\n$plan")
  }

  // ------------------------------------------- hybrid RRF retrieval

  test("hybrid rrf: fusion matches an independent recompute of both legs") {
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val kEach = 20
    // text leg ranks: bm25Search's output order IS (score desc, doc_id)
    val tRnk = TextQueries.bm25Search(spark, sf, limit = kEach).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (d, i) => d -> (i + 1) }.toMap
    // vector leg ranks recomputed driver-side from raw embeddings
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val q = vecs.toMap.apply(0L)
    def dot(a: Seq[Double], b: Seq[Double]) = a.lazyZip(b).map(_ * _).sum
    def nrm(a: Seq[Double]) = math.sqrt(dot(a, a))
    val vRnk = vecs.map { case (id, v) => (id, r4(dot(v, q) / (nrm(v) * nrm(q)))) }
      .sortBy { case (id, c) => (-c, id) }.take(kEach)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expect = (tRnk.keySet ++ vRnk.keySet).toSeq.map { d =>
      val s = tRnk.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vRnk.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (d, r4(s), tRnk.get(d), vRnk.get(d))
    }.sortBy { case (d, s, _, _) => (-s, d) }.take(10)
    val got = HybridSearch.rrfFusion(spark, sf).collect().map { r =>
      (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2).toInt),
        if (r.isNullAt(3)) None else Some(r.getLong(3).toInt))
    }.toSeq
    assert(got == expect,
      s"got=${got.take(4)}... expect=${expect.take(4)}...")
  }

  test("hybrid rrf: corpus-sized work stays in the legs (fusion join is tiny)") {
    val plan = HybridSearch.rrfFusion(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    // the 1-row query-vector attach must be a broadcast, not a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query vector not broadcast in:\n$plan")
  }
}
