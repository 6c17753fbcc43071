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

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader surfaces as LongType under `spark.sql.legacy.parquet
    * .nanosAsLong` (set session-wide in GraftSession) — and plain
    * TIMESTAMP(MICROS), which reads back as TimestampType directly.
    * Adapt on the observed schema: convert raw nanos to a microsecond
    * TimestampType column (the truncation every TIMESTAMP(MICROS)
    * engine applies) only when the column is a long; pass a native
    * timestamp through unchanged.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not `/`: double division loses exactness above
        // 2^53 and nanosecond epochs (~1.7e18) are past that — a value
        // within ~1µs of a boundary could round to the wrong microsecond
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ =>
        // TIMESTAMP_NTZ (isAdjustedToUTC=false parquet): cast to the
        // session-zoned TimestampType every downstream consumer expects
        // (unix_millis etc. reject NTZ). The session timezone is pinned
        // to UTC in GraftSession, so the cast relabels without shifting
        // any instant — the same reading DuckDB gives naive timestamps.
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
