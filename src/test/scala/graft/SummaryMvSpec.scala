package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.plans.SummaryRegistry

/** Specs for the summary-table rewrite rule: the executed plan must
  * actually read the summary (that is the entire point — fact scan
  * avoided), results must be byte-equal to the direct computation, and
  * every non-matching shape must fall through untouched.
  */
class SummaryMvSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withSummary[A](body: => A): A =
    try { SummaryMv.ensureLineitemSummary(spark, sf); body }
    finally SummaryRegistry.clear()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrite fires: executed plan scans the summary, not the fact") {
    withSummary {
      val df = SummaryMv.summarize(spark, sf)
      val plan = planOf(df)
      assert(plan.contains("graft-mv"), s"summary path absent from plan:\n$plan")
      assert(!plan.contains("lineitem.parquet"), s"fact still scanned:\n$plan")
    }
  }

  test("rewritten results equal the direct fact aggregation exactly") {
    // the direct baseline restates summarize()'s aggregate WITHOUT
    // calling it — summarize registers the summary before collecting,
    // so using it for the baseline would compare rewritten-to-rewritten
    SummaryRegistry.clear()
    val direct = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag") =!= "X")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        avg(col("l_quantity")).as("avg_qty"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq)
    val rewritten = withSummary {
      val df = SummaryMv.summarize(spark, sf)
      assert(planOf(df).contains("graft-mv"), "summarize not served from the summary")
      df.collect().map(_.toSeq)
    }
    // BIT-exact across every column: the summary registers only
    // exact-under-merge measures (integer-valued quantities), which is
    // precisely why the rewrite is allowed to stay registered
    // session-wide without perturbing any other hash-compared query
    assert(direct.length == rewritten.length)
    direct.zip(rewritten).foreach { case (d, r) =>
      assert(d == r, s"rewritten row differs: $d vs $r")
    }
  }

  test("global aggregate (no grouping) also rewrites") {
    withSummary {
      val df = Tables.load(spark, sf, "lineitem")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sq"))
      assert(planOf(df).contains("graft-mv"), "global agg not rewritten")
      val row = df.collect().head
      val want = Tables.load(spark, sf, "lineitem").count()
      assert(row.getLong(0) == want)
    }
  }

  test("rewrite is front-end-agnostic: fires through spark.sql too") {
    // direct result computed BEFORE registration, so it truly scans
    // the fact rather than comparing rewritten-to-rewritten
    val direct = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sq"))
      .collect().map(_.toSeq).toSet
    withSummary {
      Tables.load(spark, sf, "lineitem").createOrReplaceTempView("li_mv_spec")
      val df = spark.sql(
        """SELECT l_linestatus, count(*) AS n, sum(l_quantity) AS sq
          |FROM li_mv_spec GROUP BY l_linestatus""".stripMargin)
      assert(planOf(df).contains("graft-mv"), s"SQL aggregate not rewritten:\n${planOf(df)}")
      assert(df.collect().map(_.toSeq).toSet == direct)
    }
  }

  test("non-covered shapes fall through: uncovered column, distinct, non-dim grouping") {
    withSummary {
      // aggregate over a column the summary doesn't carry
      val uncovered = Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_discount")))
      assert(!planOf(uncovered).contains("graft-mv"), "uncovered measure rewritten")
      // float measures are deliberately unregistered (merge-order ulps
      // would perturb hash-compared results) — so a price aggregate
      // must hit the fact even though its shape is otherwise covered
      val floatMeasure = Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_extendedprice")))
      assert(!planOf(floatMeasure).contains("graft-mv"), "float measure rewritten")
      // DISTINCT aggregates are not algebraic
      val dist = Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(countDistinct(col("l_quantity")))
      assert(!planOf(dist).contains("graft-mv"), "distinct agg rewritten")
      // grouping by a non-dim column
      val nonDim = Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")))
      assert(!planOf(nonDim).contains("graft-mv"), "non-dim grouping rewritten")
      // filter on a non-dim column
      val nonDimFilter = Tables.load(spark, sf, "lineitem")
        .filter(col("l_suppkey") > 10)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
      assert(!planOf(nonDimFilter).contains("graft-mv"), "non-dim filter rewritten")
    }
  }

  test("unregistered session state: no registry entry, no rewrite") {
    SummaryRegistry.clear()
    val df = SummaryMv.summarize(spark, sf)
    // summarize registers as a side effect, so clear again and build a
    // plain aggregate to probe the empty-registry path
    SummaryRegistry.clear()
    val plain = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
    assert(!planOf(plain).contains("graft-mv"))
    assert(df.columns.length == 6)
  }

  test("incremental merge: summary(base) + delta == summary(base ∪ delta)") {
    val dims = Seq("l_returnflag", "l_linestatus")
    val measures = Seq("l_quantity", "l_extendedprice")
    val fact = Tables.load(spark, sf, "lineitem")
    val base = fact.filter(col("l_orderkey") % 5 =!= 0)
    val delta = fact.filter(col("l_orderkey") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-merge").toString
    val path = s"$dir/sum"
    SummaryMv.build(base, dims, measures, path)
    SummaryMv.merge(spark, delta, dims, measures, path)
    val merged = spark.read.parquet(path)
    val full = java.nio.file.Files.createTempDirectory("graft-mv-full").toString
    SummaryMv.build(fact, dims, measures, s"$full/sum")
    val direct = spark.read.parquet(s"$full/sum")
    val cols = merged.columns.sorted.map(col).toSeq
    val a = merged.select(cols: _*).orderBy(cols: _*).collect().map(_.toSeq)
    val b = direct.select(cols: _*).orderBy(cols: _*).collect().map(_.toSeq)
    // cnt/min/max exact; sums are double adds in a different order —
    // compare exactly where exact, 1e-6-relative on the sums
    assert(a.length == b.length, "dim-combination sets differ")
    val sumIdx = merged.columns.sorted.zipWithIndex
      .collect { case (n, i) if n.startsWith("sum_") => i }.toSet
    a.zip(b).foreach { case (ra, rb) =>
      ra.indices.foreach { i =>
        if (sumIdx(i)) {
          val (x, y) = (ra(i).asInstanceOf[Double], rb(i).asInstanceOf[Double])
          assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)), s"sum drifted: $x vs $y")
        } else assert(ra(i) == rb(i), s"col $i differs: ${ra(i)} vs ${rb(i)}")
      }
    }
  }

  test("streaming maintenance: per-batch merged summary == batch build over all rows") {
    import org.apache.spark.sql.functions.col
    val dims = Seq("event_type"); val measures = Seq("value")
    // stage the events as four files so the file source delivers four
    // micro-batches — exercising build on batch 0 and merge on 1..3
    val staged = java.nio.file.Files.createTempDirectory("graft-mv-stream-src").toString
    Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value"))
      .repartition(4).write.mode("overwrite").parquet(staged)
    val parent = java.nio.file.Files.createTempDirectory("graft-mv-stream").toString
    val path = s"$parent/sum"
    // plant a LEFTOVER summary at the output path: the maintenance
    // loop must overwrite it from its own staged partials, never merge
    // into it (the double-count failure mode of merge-into-state)
    SummaryMv.build(
      Tables.load(spark, sf, "events").select(col("event_type"), col("value")).limit(50),
      dims, measures, path)
    val src = spark.readStream
      .schema("event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
    val q = graft.streaming.EventStream.maintainSummary(src, dims, measures, path)
    try q.processAllAvailable() finally q.stop()
    // replay simulation: re-running the rebuild over the same staged
    // partials (what a replayed batch does after its skip) must leave
    // the summary byte-identical
    val staging = new java.io.File(parent).listFiles()
      .map(_.toString).filter(_.contains("sum.batches-")).head
    val before = spark.read.parquet(path).orderBy(col("event_type")).collect().toSeq
    SummaryMv.rebuildFromPartials(spark, staging, dims, measures, path)
    assert(spark.read.parquet(path).orderBy(col("event_type")).collect().toSeq == before,
      "rebuild over unchanged partials must be idempotent")
    val streamed = spark.read.parquet(path)
    val full = java.nio.file.Files.createTempDirectory("graft-mv-stream-full").toString
    SummaryMv.build(
      Tables.load(spark, sf, "events").select(col("event_type"), col("value")),
      dims, measures, s"$full/sum")
    val direct = spark.read.parquet(s"$full/sum")
    val a = streamed.orderBy(col("event_type")).collect().map(_.toSeq)
    val b = direct.orderBy(col("event_type")).collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ra, rb) =>
      // (event_type, cnt, sum_value, min_value, max_value)
      assert(ra(0) == rb(0) && ra(1) == rb(1) && ra(3) == rb(3) && ra(4) == rb(4),
        s"exact cols differ: $ra vs $rb")
      val (x, y) = (ra(2).asInstanceOf[Double], rb(2).asInstanceOf[Double])
      assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)), s"sum drifted: $x vs $y")
    }
  }

  test("exhaustive covered shapes: every dim subset × aggregate form is exact") {
    val aggForms: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "count" -> count(lit(1)).as("v"),
      "sum" -> sum(col("l_quantity")).as("v"),
      "min" -> min(col("l_quantity")).as("v"),
      "max" -> max(col("l_quantity")).as("v"),
      "avg" -> avg(col("l_quantity")).as("v"),
      "nested" -> round(sum(col("l_quantity")) * 2 + 1, 1).as("v"))
    val dimSets: Seq[Seq[String]] = Seq(
      Seq(), Seq("l_returnflag"), Seq("l_linestatus"),
      Seq("l_returnflag", "l_linestatus"))
    // direct answers computed BEFORE registration
    def run(dims: Seq[String], agg: org.apache.spark.sql.Column) = {
      val base = Tables.load(spark, sf, "lineitem")
      val df = if (dims.isEmpty) base.agg(agg)
      else base.groupBy(dims.map(col): _*).agg(agg)
      df
    }
    val direct = for (d <- dimSets; (n, a) <- aggForms)
      yield (d, n) -> run(d, a).collect().map(_.toSeq).toSet
    withSummary {
      direct.foreach { case ((dims, name), want) =>
        val df = run(dims, aggForms.toMap.apply(name))
        assert(planOf(df).contains("graft-mv"),
          s"shape (dims=$dims, agg=$name) not rewritten:\n${planOf(df)}")
        assert(df.collect().map(_.toSeq).toSet == want,
          s"shape (dims=$dims, agg=$name) differs from direct")
      }
    }
  }

  test("avg over a nullable measure divides by the non-null count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-null").toString
    val factPath = s"$dir/fact.parquet"
    Seq(("A", Some(2.0)), ("A", None), ("B", Some(6.0)), ("B", Some(2.0)))
      .toDF("d", "x").write.parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val direct = fact.groupBy(col("d")).agg(avg(col("x")).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(direct("A") == 2.0 && direct("B") == 4.0)
    SummaryMv.build(fact, Seq("d"), Seq("x"), s"$dir/sum")
    SummaryMv.register(spark, factPath, s"$dir/sum", Seq("d"), Seq("x"))
    try {
      val df = spark.read.parquet(factPath).groupBy(col("d")).agg(avg(col("x")).as("a"))
      assert(planOf(df).contains(s"$dir/sum"), "nullable-measure avg not rewritten")
      val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == direct, s"avg over nullable measure wrong: $got vs $direct")
    } finally SummaryRegistry.clear()
  }

  test("count over an empty fact rewrites to 0, not NULL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-empty").toString
    val factPath = s"$dir/fact.parquet"
    Seq.empty[(String, Double)].toDF("d", "x").write.parquet(factPath)
    val fact = spark.read.parquet(factPath)
    SummaryMv.build(fact, Seq("d"), Seq("x"), s"$dir/sum")
    SummaryMv.register(spark, factPath, s"$dir/sum", Seq("d"), Seq("x"))
    try {
      val df = spark.read.parquet(factPath).agg(count(lit(1)).as("n"))
      assert(planOf(df).contains(s"$dir/sum"), "empty-fact count not rewritten")
      val row = df.collect().head
      assert(!row.isNullAt(0) && row.getLong(0) == 0L,
        s"count over empty fact: ${row.get(0)} (must be 0, not NULL)")
    } finally SummaryRegistry.clear()
  }

  test("merge refreshes a live registration (no stale file listing)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-refresh").toString
    val factPath = s"$dir/fact.parquet"
    Seq(("A", 1.0), ("B", 2.0)).toDF("d", "x").write.parquet(factPath)
    SummaryMv.build(spark.read.parquet(factPath), Seq("d"), Seq("x"), s"$dir/sum")
    SummaryMv.register(spark, factPath, s"$dir/sum", Seq("d"), Seq("x"))
    try {
      // ingest a delta into BOTH the fact and (via merge) the summary
      val delta = Seq(("A", 3.0)).toDF("d", "x")
      delta.write.mode("append").parquet(factPath)
      SummaryMv.merge(spark, delta, Seq("d"), Seq("x"), s"$dir/sum")
      // the registered plan must now read the REPLACED summary files
      val df = spark.read.parquet(factPath).groupBy(col("d"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      assert(planOf(df).contains(s"$dir/sum"), "post-merge query not rewritten")
      val got = df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(got == Map("A" -> (4.0, 2L), "B" -> (2.0, 1L)), s"stale summary served: $got")
    } finally SummaryRegistry.clear()
  }

  test("non-deterministic expressions disqualify the rewrite") {
    withSummary {
      // rand() is attribute-free, so without a determinism guard the
      // generic rewrite case would pass it through — and a sampling
      // predicate evaluated per summary GROUP is not the per-fact-ROW
      // sample the query asked for
      val sampled = Tables.load(spark, sf, "lineitem")
        .filter(rand(42) < 0.5)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
      assert(!planOf(sampled).contains("graft-mv"), "non-deterministic filter rewritten")
      // same for a non-deterministic expression inside the aggregate list
      val aggSide = Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg((sum(col("l_quantity")) + rand(7) * 0).as("v"))
      assert(!planOf(aggSide).contains("graft-mv"), "non-deterministic agg expr rewritten")
      // determinism guard must not over-reject: the covered shape still fires
      val covered = Tables.load(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")))
      assert(planOf(covered).contains("graft-mv"), "covered shape no longer rewritten")
    }
  }

  test("registry refuses float measures whose sums are not exact under merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mv-float").toString
    val factPath = s"$dir/fact.parquet"
    Seq(("A", 1.25), ("A", 2.5), ("B", 3.0)).toDF("d", "x").write.parquet(factPath)
    val fact = spark.read.parquet(factPath)
    SummaryMv.build(fact, Seq("d"), Seq("x"), s"$dir/sum")
    // fractional values → partial-merged sums can drift by
    // summation-order ulps → default registration must refuse
    val e = intercept[IllegalArgumentException] {
      SummaryMv.register(spark, factPath, s"$dir/sum", Seq("d"), Seq("x"))
    }
    assert(e.getMessage.contains("allowInexact"))
    // the refusal left no registration behind: the gate (hash-compared
    // queries over this fact) is untouched
    val probe = fact.groupBy(col("d")).agg(sum(col("x")))
    assert(!planOf(probe).contains(s"$dir/sum"))
    // explicit opt-in registers and rewrites (production posture)
    SummaryMv.register(spark, factPath, s"$dir/sum", Seq("d"), Seq("x"),
      allowInexact = true)
    try assert(planOf(fact.groupBy(col("d")).agg(sum(col("x")))).contains(s"$dir/sum"))
    finally SummaryRegistry.clear()
  }

  test("summary table is metadata-scale") {
    withSummary {
      val mvPath = SummaryMv.ensureLineitemSummary(spark, sf)
      val mvRows = spark.read.parquet(mvPath).count()
      val dims = Tables.load(spark, sf, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct().count()
      assert(mvRows == dims, "summary not exactly one row per dim combination")
    }
  }
}
