package graft

import org.apache.spark.sql.functions._

/** Round-15 specs: pagerank checkpoint-block lifecycle (the r14 bench
  * leak), warm-start pagerank (identical fixed point, fewer
  * iterations), and the seed pin-protection contract.
  */
class Round15Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def convergedAt(): Option[Int] = Option(
    spark.sparkContext.getLocalProperty("graft.pagerank.converged_at"))
    .map(_.toInt)

  // --- checkpoint lifecycle: the r14 leak is closed -------------------

  test("pageRank frees every superseded checkpoint: after a run, only " +
    "the handed-off final's blocks remain; the next run frees those too") {
    import graft.operators.Graphs
    val r1 = Graphs.pageRank(spark, sf, iters = 7) // 5+2: it0 + 2 chunks + out
    r1.count()
    val ids1 = Graphs.lastRunCheckpointIds
    assert(ids1.size == 4, s"expected it0+2 chunks+out, got $ids1")
    val live1 = spark.sparkContext.getPersistentRDDs.keySet
    val (dead, handed) = (ids1.init, ids1.last)
    assert(dead.forall(id => !live1.contains(id)),
      s"superseded checkpoints still persisted: ${dead.filter(live1.contains)}")
    assert(live1.contains(handed),
      "the result-backing checkpoint must stay alive for the caller")
    // the result stays CONSUMABLE after the loop's internal frees
    assert(r1.count() == r1.collect().length)

    // a second run frees the first's handoff at entry
    val r2 = Graphs.pageRank(spark, sf, iters = 2)
    r2.count()
    val live2 = spark.sparkContext.getPersistentRDDs.keySet
    assert(!live2.contains(handed),
      "previous run's handed-off checkpoint must be freed at next entry")
    assert(live2.contains(Graphs.lastRunCheckpointIds.last))
    Graphs.releaseResults()
    assert(!spark.sparkContext.getPersistentRDDs.keySet
      .contains(Graphs.lastRunCheckpointIds.last),
      "releaseResults must free the last handoff")
  }

  // --- warm start: exact continuation on the REAL graph ---------------

  test("pageRankWarm seeded with the k-iteration iterate continues " +
    "bit-exactly: warm(seed=cold(3), 4 more) == cold(7)") {
    import graft.operators.Graphs
    val cold3 = Graphs.pageRank(spark, sf, iters = 3)
    cold3.count() // materialize before it becomes a (pinned) seed
    val warm = Graphs.pageRankWarm(spark, sf, cold3, iters = 4)
    val warmRows = warm.collect().toSeq // consume before any later run frees it
    val cold7 = Graphs.pageRank(spark, sf, iters = 7).collect().toSeq
    assert(warmRows == cold7,
      "the update is deterministic, so seeding with iterate 3 and running " +
        "4 more must equal the 7-iteration unroll node for node")
    Graphs.releaseResults()
  }

  // --- warm start: same fixed point, fewer iterations -----------------
  // The sf supply graph never reaches a strict integer fixed point
  // (PLANS.md: ±1-unit cycling), so the convergence claims are proven
  // on a synthetic hub-of-cliques graph that DOES converge exactly.

  private def cliqueEdges(sizes: Seq[Int]): Seq[(String, String)] = {
    val e = scala.collection.mutable.ListBuffer.empty[(String, String)]
    sizes.zipWithIndex.foreach { case (sz, ci) =>
      val ids = (0 until sz).map(i => s"c${ci}n$i")
      for (a <- ids; b <- ids if a < b) { e += ((a, b)); e += ((b, a)) }
      e += ((s"c${ci}n0", "hub")); e += (("hub", s"c${ci}n0"))
    }
    e.toSeq
  }

  test("pageRankWarm on a perturbed graph converges to the IDENTICAL " +
    "integer fixed point as a cold run, in fewer executed iterations") {
    import spark.implicits._
    import graft.operators.Graphs
    val all = cliqueEdges(Seq.tabulate(30)(i => 3 + i % 6))
    val base = all.toDF("src", "dst")
    // perturb WITHOUT changing the node count (teleport unchanged):
    // drop one edge inside clique 0 — a LOCAL delta, so yesterday's
    // ranks are already near the new fixed point
    val pert = all.filterNot { case (a, b) =>
      Set(a, b) == Set("c0n1", "c0n2") }.toDF("src", "dst")

    val cold0 = Graphs.run(spark, base, 300, None)
    cold0.count()
    assert(convergedAt().isDefined, "base graph must reach an exact fixed point")

    val warm = Graphs.run(spark, pert, 300, Some(cold0))
    val warmRows = warm.collect().toSeq
    val warmIters = convergedAt()
    assert(warmIters.isDefined, "warm run must reach the fixed point")

    val coldP = Graphs.run(spark, pert, 300, None)
    val coldPRows = coldP.collect().toSeq
    val coldIters = convergedAt()
    assert(coldIters.isDefined, "cold perturbed run must reach the fixed point")

    assert(warmRows == coldPRows,
      "the fixed point is start-independent: warm and cold runs on the " +
        "perturbed graph must agree node for node")
    assert(warmIters.get < coldIters.get,
      s"warm start must save iterations: warm=$warmIters cold=$coldIters")
    Graphs.releaseResults()
  }

  // --- capped distinct aggregation (the media-exact df gate) ----------

  test("CappedDistinctAggregator: exact sorted sets under the cap; " +
    "over-cap groups stop at cap+1 elements; equals collect_set gating") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    val cap = 4
    val capped = udaf(new graft.functions.CappedDistinctAggregator(cap))
    // group g1: 3 distinct (under cap, with duplicates); g2: exactly cap;
    // g3: cap+3 distinct (over cap — must be detected, not fully built)
    val rows = Seq.tabulate(3)(i => ("g1", i.toLong)) ++
      Seq(("g1", 1L), ("g1", 2L)) ++
      Seq.tabulate(4)(i => ("g2", 10L + i)) ++
      Seq.tabulate(7)(i => ("g3", 100L + i))
    // many partitions so merge() paths are exercised
    val df = rows.toDF("g", "id").repartition(8)
    val got = df.groupBy($"g").agg(capped($"id").as("ms"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("g1") == Seq(0L, 1L, 2L), s"under-cap must be exact: ${got("g1")}")
    assert(got("g2") == Seq(10L, 11L, 12L, 13L))
    assert(got("g3").size == cap + 1,
      s"over-cap groups must stop at cap+1 (provably droppable): ${got("g3")}")
    assert(got("g3") == got("g3").sorted && got("g3").distinct == got("g3"))
    // the operator-level equivalence: size-gated capped agg == size-gated
    // collect_set (the contract mediaNearDupsExact relies on)
    import org.apache.spark.sql.functions.{collect_set, size => asize, array_sort}
    val viaCollect = df.groupBy($"g")
      .agg(array_sort(collect_set($"id")).as("ms"))
      .filter(asize($"ms") <= cap)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaCapped = got.filter(_._2.size <= cap)
    assert(viaCapped == viaCollect)
  }

  // --- drift fixture must not re-pin session conf ----------------------

  test("buildDriftedCorpus restores spark.sql.parquet.outputTimestampType " +
    "to UNSET when it was never set (not to a pinned fallback)") {
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      val tmp = java.nio.file.Files.createTempDirectory("graft-drift-conf").toString
      graft.sources.SchemaDrift.buildDriftedCorpus(spark, "/root/testdata/sf0.001", tmp)
      graft.operators.ArtifactCache.deleteRecursively(new java.io.File(tmp))
      // an unset conf must STAY unset: Spark's built-in default is INT96,
      // and pinning TIMESTAMP_MICROS would silently change the physical
      // encoding of every later parquet write in the session
      assert(spark.conf.getOption(key).isEmpty ||
        spark.conf.getOption(key).contains("INT96"),
        s"conf must not be pinned after the fixture build: ${spark.conf.getOption(key)}")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => if (spark.conf.getOption(key).isDefined) spark.conf.unset(key)
    }
  }

  test("pageRank clears a stale converged_at: a non-converging run after " +
    "a converged one must not report the old iteration count") {
    import spark.implicits._
    import graft.operators.Graphs
    val g = cliqueEdges(Seq(3, 4, 5)).toDF("src", "dst")
    Graphs.run(spark, g, 300, None).count()
    assert(convergedAt().isDefined)
    // 2 iterations is far short of this graph's fixed point
    Graphs.run(spark, g, 2, None).count()
    assert(convergedAt().isEmpty,
      "stale converged_at from the previous run must be cleared at entry")
    Graphs.releaseResults()
  }
}
