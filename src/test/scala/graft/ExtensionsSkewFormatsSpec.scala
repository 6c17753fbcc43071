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
