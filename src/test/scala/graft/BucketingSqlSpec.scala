package graft

import org.apache.spark.sql.functions._

import graft.sources.Catalog

class BucketingSqlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches DataFrame API result") {
    Catalog.registerAll(spark, sf)
    val viaSql = Catalog.sql(spark, sf,
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS n FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    val viaDf = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("bucketed fact-fact join runs without a shuffle Exchange") {
    Catalog.bucketFacts(spark, sf)
    val joined = spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must consume bucketed scans directly: no
    // ShuffleExchange feeding the SortMergeJoin
    val joinSection = plan.split("HashAggregate").head
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side shuffled:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side shuffled:\n$plan")
    // and the result equals the unbucketed join
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ==
      plain.orderBy("o_orderstatus").collect().toSeq)
  }
}
