package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL front-end: register the testdata star schema as temp views so
  * the whole query surface is reachable through `spark.sql(...)` as
  * well as the DataFrame API (same Catalyst plans either way).
  */
object Catalog {

  def registerAll(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }

  /** Persist two fact tables bucketed by their join key. Bucketed
    * tables make the fact⋈fact join shuffle-free: both sides are
    * pre-partitioned on disk by the same key into the same bucket
    * count, so SortMergeJoin reads co-located buckets with no
    * Exchange — the 100 TB answer to the biggest shuffle in the
    * workload (asserted in BucketingSpec).
    */
  def bucketFacts(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    // the in-memory catalog forgets tables across JVMs but their
    // warehouse locations persist — clear both before recreating
    Seq("lineitem_bucketed", "orders_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    Tables.load(spark, dir, "lineitem").write
      .mode("overwrite").format("parquet")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    Tables.load(spark, dir, "orders").write
      .mode("overwrite").format("parquet")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
  }
}
