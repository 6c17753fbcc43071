package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver testdata star schema (TESTDATA.md).
  *
  * Plain parquet scans: Catalyst/DSv2 supplies predicate pushdown,
  * column pruning and partition pruning on top of these — verified via
  * `.explain` in the specs (SURVEY §4.3); nothing to reimplement.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). The session sets
    * `spark.sql.legacy.parquet.nanosAsLong` (GraftSession — session
    * scope, so parquet read semantics never depend on query order);
    * this loader converts the raw nanos to a microsecond TimestampType
    * column — the same truncation every TIMESTAMP(MICROS) engine
    * applies.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$dir/events.parquet")
      // integer `div`, not `/`: double division loses exactness above
      // 2^53 and nanosecond epochs (~1.7e18) are past that — a value
      // within ~1µs of a boundary could round to the wrong microsecond
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
