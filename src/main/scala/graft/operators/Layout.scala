package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering and small-file
  * compaction. Neither exists in the reference (its sink is the fixed
  * 26-letter layout, SURVEY §2.1 O15); both are table-stakes for a
  * 100 TB lake, where "which files does this query touch" dominates
  * cost long before any operator runs.
  *
  * Z-order: interleaving the bits of two sort keys gives a 1-D order
  * in which points close in EITHER dimension land in the same file, so
  * parquet footer min/max stats prune a 2-D box query down to a few
  * files — a single-column sort prunes one dimension and leaves the
  * other striped across every file. The interleave is five mask/shift
  * rounds per column (the standard Morton-spread bit trick), all
  * Catalyst built-ins ⇒ whole-stage codegen, no UDF.
  *
  * Compaction: sizes the output file count from the optimizer's own
  * byte statistics instead of inheriting the input's partitioning, so
  * a million-small-file input compacts to ceil(bytes/target) outputs
  * — the "small files problem" fix run after every streaming ingest.
  */
object Layout {

  /** Spread the low 32 bits of a non-negative long into the even bit
    * positions (0,2,4,…,62): classic Morton-code bit spread, five
    * shift+mask rounds. Input must be in [0, 2^32).
    */
  def spreadBits(v: Column): Column = {
    val masks = Seq(
      (16, 281470681808895L),    // 0x0000FFFF0000FFFF
      (8, 71777214294589695L),   // 0x00FF00FF00FF00FF
      (4, 1085102592571150095L), // 0x0F0F0F0F0F0F0F0F
      (2, 3689348814741910323L), // 0x3333333333333333
      (1, 6148914691236517205L)) // 0x5555555555555555
    masks.foldLeft(v.bitwiseAND(lit(4294967295L))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }
  }

  /** 64-bit Z-value of (x, y): x's bits at even positions, y's at odd.
    * y is masked to 31 bits so the sign bit stays clear and the value
    * orders correctly as a signed long in every engine.
    */
  def zValue(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y.bitwiseAND(lit(2147483647L))), 1))

  /** Write `df` clustered by ascending `z` into `numFiles` files:
    * range-partition on z (so each file owns a contiguous z-range ⇒ a
    * compact bounding box in (x, y)), sort within partitions (so
    * parquet row-group stats inside each file are tight too). One
    * shuffle; spill-safe external sort; no driver involvement.
    */
  def zOrderWrite(df: DataFrame, z: Column, numFiles: Int, outDir: String): Unit =
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)

  /** Per-file (x, y) bounding boxes of a written table — the exact
    * metadata a parquet footer exposes to scan pruning, recomputed
    * from data so a spec can PROVE how many files a box query touches
    * under a given layout instead of trusting reader internals.
    */
  def fileBoundingBoxes(written: DataFrame, x: Column, y: Column): DataFrame =
    written
      .select(input_file_name().as("file"), x.as("x"), y.as("y"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Of `boxes` (from [[fileBoundingBoxes]]), the files a scan with
    * `x BETWEEN x1 AND x2 AND y BETWEEN y1 AND y2` cannot skip.
    */
  def filesTouched(boxes: DataFrame, x1: Long, x2: Long, y1: Long, y2: Long): Long =
    boxes.filter(col("x_min") <= x2 && col("x_max") >= x1 &&
      col("y_min") <= y2 && col("y_max") >= y1).count()

  /** events keyed for Z-ordering: x = user_id, y = epoch seconds.
    * Both dimensions are query predicates in practice (per-user scans,
    * time-range scans, and their intersection).
    */
  private def eventsXY(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("event_id"),
      col("user_id").cast("long").as("x"),
      unix_timestamp(col("ts")).as("y"))

  /** Z-value per event — the clustering key [[zOrderWrite]] sorts by.
    * Exact-oracle query: the five mask/shift rounds are plain integer
    * ops any engine reproduces bit-for-bit.
    */
  def zOrderEvents(s: SparkSession, dir: String): DataFrame =
    eventsXY(s, dir)
      .withColumn("zval", zValue(col("x"), col("y")))
      .orderBy(col("event_id"))

  /** Pruning report at 64-bucket granularity: slice the z-ordered
    * corpus into 64 equal runs (what `repartitionByRange(64, z)`
    * produces physically), then per bucket the (x, y) bounding box and
    * whether a fixed 2-D box query — users 3–9 × Jan 10–15 — could
    * skip it. Z-clustering keeps both coordinates compact per bucket,
    * so most buckets miss the box; a one-dimensional sort leaves the
    * other dimension striped across ALL buckets.
    *
    * The global ntile window makes the bucketization exactly
    * reproducible for the DuckDB oracle; the production path is
    * [[zOrderWrite]], whose range partitioner SAMPLES boundaries
    * instead of globally sorting (LayoutSpec proves the same pruning
    * on real written files).
    */
  def zOrderPruneReport(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("zval"), col("event_id"))
    zOrderEvents(s, dir)
      .withColumn("bucket", ntile(64).over(w).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("hits_box",
        (col("x_min") <= lit(9L) && col("x_max") >= lit(3L) &&
          col("y_min") <= lit(1705276800L) && col("y_max") >= lit(1704844800L))
          .cast("long"))
      .orderBy(col("bucket"))
  }

  /** Write planning from byte statistics: per source, estimated bytes
    * and the file count a 64 KiB-target compaction would produce —
    * [[compact]]'s sizing rule as an inspectable report.
    */
  def compactionPlan(s: SparkSession, dir: String, targetBytes: Long = 65536L): DataFrame =
    Tables.load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes_est"))
      .withColumn("n_files",
        ceil(col("bytes_est").cast("double") / targetBytes).cast("long"))
      .orderBy(col("source"))

  /** Compact `df` into files of ~`targetBytes` each. The file count
    * comes from the optimizer's size statistics (for file sources:
    * actual on-disk bytes), scaled by `outputRatio` = expected
    * output-bytes / input-bytes (re-encoding parquet→parquet ≈ 1.0).
    * Round-robin repartition — not coalesce — so every output file is
    * the same size regardless of input skew; coalesce would glue
    * adjacent small inputs and preserve their skew.
    * Returns the chosen file count.
    */
  def compact(df: DataFrame, targetBytes: Long, outDir: String,
      outputRatio: Double = 1.0): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0 (got $targetBytes)")
    val inputBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((BigDecimal(inputBytes) * outputRatio / targetBytes)
      .setScale(0, BigDecimal.RoundingMode.CEILING).toInt).max(1)
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    n
  }
}
