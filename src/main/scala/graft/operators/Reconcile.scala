package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot reconciliation by bucket checksums — the anti-entropy pass
  * two copies of a 100 TB table run to find WHERE they disagree without
  * shipping or comparing a single row: each side folds its rows into
  * `buckets` (hash of the row key) and reduces every bucket to a count
  * and a key-checksum; buckets whose (count, checksum) agree are
  * PROVABLY-cheaply skippable, and only differing buckets — typically a
  * handful — need row-level repair. Cost per side is one scan plus a
  * `buckets`-row shuffle; the compare itself is a join of two tiny
  * summaries. This is the Merkle-tree / DynamoDB-anti-entropy idea
  * flattened to one level, expressed relationally.
  *
  * The hash is the engine-portable multiplicative scheme used by
  * [[DatasetOps.mixtureSample]] (pure BIGINT modular arithmetic, so the
  * DuckDB oracle reproduces it bit-for-bit): `h(id) = (id mod p) ·
  * (2654435761 mod p) mod p` with p = 1000003. Checksums are SUMS of
  * h(id) — order-independent, exact in int64 far past 10¹² rows per
  * bucket — so bucket reduction commutes with partitioning.
  */
object Reconcile {

  private val P = 1000003L
  private val Mult = 2654435761L % P

  private def rowHash(id: Column): Column = ((id % P) * Mult) % P

  /** Per-bucket (row count, key checksum) summary of one snapshot.
    * `idCol` is the row identity; rows hash to `pmod(h, buckets)`.
    */
  def bucketChecksums(t: DataFrame, idCol: String, buckets: Int): DataFrame = {
    val h = rowHash(col(idCol))
    t.select(pmod(h, lit(buckets.toLong)).as("bucket"), h.as("h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("checksum"))
  }

  /** Compare two snapshots bucket-wise. Output: one row per bucket that
    * exists in either side, with both sides' counts/checksums and a
    * verdict — `match`, `count_diff` (different row sets, size visible)
    * or `checksum_diff` (same size, different membership — the case a
    * count-only compare misses).
    */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
      buckets: Int = 64): DataFrame = {
    val ca = bucketChecksums(a, idCol, buckets)
      .select(col("bucket"), col("n").as("n_a"), col("checksum").as("sum_a"))
    val cb = bucketChecksums(b, idCol, buckets)
      .select(col("bucket"), col("n").as("n_b"), col("checksum").as("sum_b"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("sum_a"), lit(0L)).as("sum_a"),
        coalesce(col("sum_b"), lit(0L)).as("sum_b"))
      .withColumn("status",
        when(col("n_a") =!= col("n_b"), lit("count_diff"))
          .when(col("sum_a") =!= col("sum_b"), lit("checksum_diff"))
          .otherwise(lit("match")))
      .orderBy(col("bucket"))
  }

  /** The q_snapshot_diff entry: reconcile the events table against a
    * simulated replica that lost every `event_id ≡ 13 (mod 97)` row
    * (~1% loss scattered across buckets) — the drift pattern a partial
    * ingest failure produces. With 64 buckets and ~1% scattered loss,
    * most buckets differ by a FEW rows each; the checksum localizes
    * repair to exactly the differing buckets.
    */
  def snapshotDiff(s: SparkSession, dir: String, buckets: Int = 64): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val replica = ev.filter(col("event_id") % 97 =!= 13)
    diff(ev, replica, "event_id", buckets)
  }
}
