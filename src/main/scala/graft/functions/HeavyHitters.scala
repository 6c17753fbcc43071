package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate frequent-items ("heavy hitters") over a column that is
  * too high-cardinality to count exactly at 100 TB.
  *
  * Two-level design with bounded memory everywhere:
  *  1. candidates via per-partition Misra–Gries summaries (capacity-
  *     bounded counter maps; any value with global frequency >
  *     partitionRows/capacity survives its partition's summary — the
  *     MG guarantee), unioned across partitions;
  *  2. each candidate's frequency estimated by a count-min sketch:
  *     `depth` seeded hash rows of `buckets` counters built by plain
  *     aggregation, estimate = MIN over the candidate's buckets
  *     (CMS never under-counts).
  *
  * Shuffle volume: buckets×depth counters + ≤ capacity candidates per
  * partition — independent of input cardinality, which is the point.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries candidate values. */
  private def mgCandidates(words: DataFrame, colName: String,
      capacity: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col(colName).cast("string")).as[String].mapPartitions { it =>
      val mg = scala.collection.mutable.HashMap[String, Long]()
      it.foreach { w =>
        if (mg.contains(w) || mg.size < capacity) mg(w) = mg.getOrElse(w, 0L) + 1
        else {
          // decrement-all step: drop every counter by one, evict zeros
          val dead = mg.iterator.collect { case (k, c) if c <= 1 => k }.toList
          mg.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(mg.remove)
        }
      }
      mg.keysIterator
    }.toDF(colName).distinct()
  }

  /** (value, est_count) for candidates whose CMS estimate ≥
    * `minCount`, ordered by estimate descending.
    */
  def frequentWords(s: SparkSession, words: DataFrame, col_ : String,
      buckets: Int = 1 << 12, depth: Int = 3,
      capacity: Int = 4096, minCount: Long = 100): DataFrame = {
    val v = col(col_)
    // sketch: depth × buckets counters via ordinary aggregation
    val sketchRows = (0 until depth).map { d =>
      words.groupBy(pmod(xxhash64(lit(d), v), lit(buckets)).as("bucket"))
        .agg(count(lit(1)).as("c"))
        .withColumn("seed", lit(d))
    }.reduce(_ unionByName _)

    val candidates = mgCandidates(words, col_, capacity)
      .select(col(col_).as("value"))

    val withBuckets = candidates.select(
      col("value"),
      explode(array((0 until depth).map(d =>
        struct(lit(d).as("seed"),
          pmod(xxhash64(lit(d), col("value")), lit(buckets)).as("bucket"))): _*)).as("b"))
      .select(col("value"), col("b.seed"), col("b.bucket"))

    withBuckets
      .join(sketchRows, Seq("seed", "bucket"))
      .groupBy(col("value"))
      .agg(min(col("c")).as("est_count"))
      .filter(col("est_count") >= minCount)
      .orderBy(col("est_count").desc, col("value").asc)
  }
}
