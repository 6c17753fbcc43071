package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Formats

class ExtensionsSkewFormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("optimizer rule rewrites HOF dot-product pattern to array_dot") {
    // non-literal input (range-derived) so ConstantFolding can't
    // collapse the expression before the rule is observable
    val df = spark.range(3)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_dot"), s"rule did not fire:\n$optimized")
    // id=2: 2*3 + 2*2 = 10
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(0.0 + 0.0, 3.0 + 2.0, 10.0)
      .map(identity).sorted.toSeq)
  }

  test("rule leaves non-matching aggregates alone") {
    import spark.implicits._
    // subtraction lambda: must NOT rewrite
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x - y),
        lit(0.0), (acc, v) => acc + v).as("r"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("array_dot"))
    assert(df.collect()(0).getDouble(0) == -4.0)
  }

  test("saltedAgg equals unsalted aggregation") {
    val li = Tables.load(spark, sf, "lineitem")
    val plain = li.groupBy(col("l_returnflag").as("_key"))
      .agg(sum(col("l_quantity")).as("qty"), sum(col("l_extendedprice")).as("px"))
    val salted = Skew.saltedAgg(li, col("l_returnflag"), col("l_orderkey"), 8,
      Map("qty" -> col("l_quantity"), "px" -> col("l_extendedprice")))
    val j = plain.as("p").join(salted.as("s"), col("p._key") === col("s._key"))
    j.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(4)) < 1e-6)
      assert(math.abs(r.getDouble(2) - r.getDouble(5)) < 1e-4)
    }
    assert(plain.count() == salted.count())
  }

  test("saltedJoin equals plain join") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey",
      col("l_quantity"), 8).count()
    assert(plain == salted)
  }

  test("hotKeyJoin: exact on a degenerate-fingerprint corpus, hot key salted in the plan") {
    // Why this exists instead of an "AQE splits it" demonstration: AQE
    // CANNOT split the canonical-map join. OptimizeSkewedJoin only
    // rewrites SortMergeJoin(Sort(ShuffleStage), Sort(ShuffleStage))
    // with ENSURE_REQUIREMENTS shuffle origins; the canonical side is
    // Sort(HashAggregate(ShuffleStage)) — the final aggregate between
    // sort and shuffle stage defeats the pattern (verified empirically
    // on Spark 4.1: a 360k-row hot key with 16KB skew thresholds and
    // forceOptimizeSkewedJoin=true still produced no skew=true node;
    // repartition(key) doesn't help — REPARTITION_BY_COL origin is
    // also rejected). Hence deterministic hot-key salting.
    val fps = spark.range(50000).select(
      when(col("id") < 40000, lit("DEGENERATE_FINGERPRINT"))
        .otherwise(col("id").cast("string")).as("fp"),
      col("id").as("doc_id"))
    val canon = fps.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("grp_n"))
    val got = Skew.hotKeyJoin(fps, canon, "fp", col("doc_id"),
      hotGroup = 1000, salts = 8)
    // the salted join must key on (fp, _salt) so the hot key's rows
    // spread over 8 reducers instead of one
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), s"join not salted:\n$plan")
    // and the result must be EXACTLY the plain join's
    val expect = fps.join(canon.drop("grp_n"), Seq("fp"))
    assert(got.select(col("fp"), col("doc_id"), col("canonical_id"))
      .except(expect).isEmpty && expect.except(
        got.select(col("fp"), col("doc_id"), col("canonical_id"))).isEmpty)
    assert(got.count() == 50000)
    // the hot key's left rows really take >1 distinct salt value
    val saltedLeft = fps.join(
      broadcast(canon.filter(col("grp_n") > 1000).select(col("fp"), lit(1L).as("_hot"))),
      Seq("fp"), "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
        pmod(xxhash64(col("doc_id")), lit(8L))).otherwise(lit(0L)))
    val distinctSalts = saltedLeft.filter(col("fp") === "DEGENERATE_FINGERPRINT")
      .select(col("_salt")).distinct().count()
    assert(distinctSalts == 8, s"hot key only used $distinctSalts salts")
  }

  test("hotKeyJoin equals the plain join on random corpora and parameters") {
    import spark.implicits._
    // randomized equivalence: whatever the key distribution, threshold
    // or salt count, salting must be a pure execution-shape change
    val rnd = new scala.util.Random(11)
    (0 until 4).foreach { trial =>
      val n = 500 + rnd.nextInt(1500)
      val nKeys = 1 + rnd.nextInt(30)
      val left = (0 until n).map(i => (i.toLong, s"k${rnd.nextInt(nKeys)}"))
        .toDF("doc_id", "fp")
      val canon = left.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("grp_n"))
      val hotGroup = 1 + rnd.nextInt(200)
      val salts = 1 + rnd.nextInt(16)
      val got = Skew.hotKeyJoin(left, canon, "fp", col("doc_id"), hotGroup, salts)
        .select(col("fp"), col("doc_id"), col("canonical_id"))
      val expect = left.join(canon.drop("grp_n"), Seq("fp"))
      assert(got.count() == n, s"trial $trial: row count")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"trial $trial differs (hotGroup=$hotGroup salts=$salts)")
    }
  }

  test("csv and jsonl round-trip preserves data") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "source", "n_chars")
    val ddl = "doc_id LONG, lang STRING, source STRING, n_chars LONG"
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    Formats.writeCsv(docs, s"$base/csv")
    Formats.writeJsonl(docs, s"$base/json")
    val csvBack = Formats.readCsv(spark, s"$base/csv", ddl)
    val jsonBack = Formats.readJsonl(spark, s"$base/json", ddl)
    assert(csvBack.except(docs).count() == 0 && docs.except(csvBack).count() == 0)
    assert(jsonBack.except(docs).count() == 0 && docs.except(jsonBack).count() == 0)
  }
}
