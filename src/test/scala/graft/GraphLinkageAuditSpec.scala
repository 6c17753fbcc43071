package graft

import org.apache.spark.sql.functions._

import graft.operators.{EntityResolution, EventsQueries, Graphs, QualityAudit}

/** Round-11 additions: fixed-point PageRank, blocked fuzzy linkage,
  * the DQ constraint audit, and dyadic time-decay — each checked
  * against an independent in-test recomputation (the DuckDB oracle
  * re-checks the same queries at the gate; these specs pin the parts
  * an oracle can't see, e.g. violation detection on corrupted data).
  */
class GraphLinkageAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("supplyEdges: symmetric, deduplicated bipartite edge list") {
    val e = Graphs.supplyEdges(spark, sf)
    val fwd = e.filter(col("src").startsWith("s")).count()
    val rev = e.filter(col("src").startsWith("p")).count()
    assert(fwd == rev && fwd > 0, "both directions, same cardinality")
    assert(e.count() == e.distinct().count(), "no duplicate edges")
  }

  test("pageRank: mass conserved up to floor leakage, teleport floor, " +
    "deterministic, degree-monotone at the top") {
    val pr = Graphs.pageRank(spark, sf, iters = 3)
    val rows = pr.collect()
    val unit = 1000000000000L
    val n = rows.length
    val total = rows.map(_.getLong(1)).sum
    // every integer division floors: leakage < 1 unit per node per
    // division site (two per node per iteration) — far under 0.1%
    assert(total <= unit && total > (unit * 999) / 1000,
      s"mass $total of $unit leaked too much")
    val teleport = (15L * unit) / (100L * n)
    assert(rows.forall(_.getLong(1) >= teleport), "teleport floor violated")
    // deterministic across runs (integer arithmetic — bit-identical)
    val again = Graphs.pageRank(spark, sf, iters = 3).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // the top-ranked node must be a top-decile-degree node: with a
    // uniform start and one damping factor, rank mass concentrates on
    // high-degree nodes of this bipartite graph
    val deg = Graphs.supplyEdges(spark, sf).groupBy(col("src"))
      .agg(count(lit(1)).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val topRanked = rows.head.getString(0)
    val degSorted = deg.values.toSeq.sorted
    assert(deg(topRanked) >= degSorted(degSorted.size * 9 / 10),
      s"top-ranked $topRanked has degree ${deg(topRanked)}")
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzyParts equals brute-force O(n²) linkage at small sf") {
    val got = EntityResolution.fuzzyParts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // brute force over all pairs, same match predicate (same noun is
    // IMPLIED by lev <= 2 only when nouns differ by > 2 edits — the
    // block is a candidate cut, so brute force must apply it too)
    val parts = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ka, na) <- parts; (kb, nb) <- parts
      if ka < kb
      if na.split(" ").last == nb.split(" ").last
      d = lev(na, nb) if d <= 2
    } yield (ka, kb, d.toLong)).toSet
    assert(want.nonEmpty, "testdata should contain fuzzy matches")
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("fuzzyParts big-block fallback: one representative pair per " +
    "matched name pair, min-key deterministic") {
    // cap 1 forces EVERY block down the representative branch
    val got = EntityResolution.fuzzyParts(spark, sf, maxBlock = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSet
    val parts = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byName = parts.groupBy(_._2).map { case (n, rs) =>
      n -> rs.map(_._1).sorted.toList
    }
    val want = scala.collection.mutable.Set[(Long, Long, String, String, Long)]()
    for ((na, ka) <- byName) {
      if (ka.size >= 2) want += ((ka(0), ka(1), na, na, 0L))
      for ((nb, kb) <- byName if na < nb
           if na.split(" ").last == nb.split(" ").last) {
        val d = lev(na, nb)
        if (d <= 2) {
          val (x, y, n1, n2) =
            if (ka.head < kb.head) (ka.head, kb.head, na, nb)
            else (kb.head, ka.head, nb, na)
          want += ((x, y, n1, n2, d.toLong))
        }
      }
    }
    assert(want.nonEmpty)
    assert(got == want.toSet,
      s"missing=${(want.toSet -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("audit: clean testdata yields zero violations over 14 constraints") {
    val rows = QualityAudit.audit(spark, sf).collect()
    assert(rows.length == 14, s"got ${rows.length} constraint rows")
    rows.foreach { r =>
      assert(r.getLong(2) > 0, s"${r.getString(0)}: empty check")
      assert(r.getLong(3) == 0L, s"${r.getString(0)}: ${r.getLong(3)} violations on clean data")
    }
  }

  test("audit detects planted PK duplicates and FK orphans") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    for (t <- Seq("customer", "lineitem", "part", "events"))
      Tables.load(spark, sf, t).write.parquet(s"$dir/$t.parquet")
    val ord = Tables.load(spark, sf, "orders")
    val one = ord.limit(1)
    // plant: one duplicated o_orderkey row + one orphan o_custkey
    ord.unionByName(one)
      .unionByName(one.withColumn("o_orderkey", lit(-1L))
        .withColumn("o_custkey", lit(-424242L)))
      .write.parquet(s"$dir/orders.parquet")
    val rep = QualityAudit.audit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rep("pk_unique_o_orderkey") == 1L, "duplicate PK missed")
    assert(rep("fk_o_custkey_exists") == 1L, "orphan FK missed")
    assert(rep("pk_unique_c_custkey") == 0L)
    // the orphan order also orphans no lineitem (key -1 never referenced)
    assert(rep("fk_l_orderkey_exists") == 0L)
  }

  test("timeDecayedValue matches an independent Scala recomputation exactly") {
    val got = EventsQueries.timeDecayedValue(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("value"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDate(2).toLocalDate))
    val maxDay = ev.map(_._3).maxBy(_.toEpochDay)
    val want = ev.groupBy(_._1).map { case (u, es) =>
      val cents = es.map { case (_, v, d) =>
        val c = math.floor(v * 100 + 0.5).toLong
        val age = math.min(java.time.temporal.ChronoUnit.DAYS.between(d, maxDay), 50L)
        (c, c >> age)
      }
      u -> (es.length.toLong, cents.map(_._2).sum, cents.map(_._1).sum)
    }
    assert(got == want)
    // decay never exceeds the undecayed total
    got.values.foreach { case (_, dec, tot) => assert(dec <= tot) }
  }
}
