package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Approximate frequent-items ("heavy hitters") over a column that is
  * too high-cardinality to count exactly at 100 TB.
  *
  * Two-level design with bounded memory everywhere:
  *  1. candidates via per-partition Misra–Gries summaries (capacity-
  *     bounded counter maps; any value with global frequency >
  *     partitionRows/capacity survives its partition's summary — the
  *     MG guarantee), unioned across partitions;
  *  2. each candidate's frequency estimated by a count-min sketch:
  *     `depth` seeded hash rows of `buckets` counters, estimate = MIN
  *     over the candidate's buckets (CMS never under-counts).
  *
  * The input is often NOT a materialized table but a projection over
  * the corpus (tokenize + normalize of every document), so the number
  * of times this function scans `words` is the number of times that
  * projection re-runs over 100 TB. It scans exactly ONCE: a single
  * `mapPartitions` pass maintains the partition's CMS counter array
  * (depth × buckets longs, ~100 KB) and its MG map side by side, then
  * emits two kinds of row into one stream — nonzero CMS cells carrying
  * partial counts, and candidate probes (one per sketch seed, landing
  * in the cell the candidate hashes to). Everything downstream runs on
  * that bounded emission (≤ depth×buckets + depth×capacity rows per
  * partition, independent of input size): `groupBy(seed, bucket)` sums
  * the cell partials and collects the probing candidates, and a final
  * tiny aggregation takes each candidate's MIN cell. The r7 shape —
  * one `groupBy` per seed plus a separate candidate pass — re-ran the
  * corpus tokenization depth + 1 = 4 times and was the bench's largest
  * regression; this shape runs it once.
  *
  * Cell and probe buckets are both computed JVM-side with the same
  * seeded xxhash64 (Spark's own [[XxHash64Function]]), so they agree by
  * construction — no cross-engine hash-parity assumption. Exactness
  * (estimate ≥ true count, and == for sub-capacity universes) is
  * asserted in SketchSpec.
  */
object HeavyHitters {

  /** One emitted row: a CMS cell partial (`word` null, `c` = the
    * partition's count for that cell) or a Misra–Gries candidate probe
    * (`word` set, `c` null).
    */
  private[graft] case class SketchRow(word: String, seed: Int, bucket: Long, c: Option[Long])

  /** Seeded xxhash64 bucket, identical for the counting and probing
    * sides (both call this). Takes the UTF8String so the hot loop
    * encodes each token once, not once per seed.
    */
  private def bucketOf(w: UTF8String, seed: Int, buckets: Int): Int = {
    val h = XxHash64Function.hash(w, StringType, 42L + seed)
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** The single corpus pass: CMS cell partials + MG candidate probes
    * in one emission (see class doc). Exposed for the dev probe.
    */
  private[graft] def emit(s: SparkSession, words: DataFrame, col_ : String,
      buckets: Int, depth: Int, capacity: Int): DataFrame = {
    import s.implicits._
    val emitted = words.select(col(col_).cast("string")).as[String]
      .mapPartitions { it =>
        val cms = Array.ofDim[Long](depth * buckets)
        // mutable counter cells so the common case is ONE map lookup
        // per token (this loop runs once per token in the corpus)
        final class Ctr(var n: Long)
        val mg = new java.util.HashMap[String, Ctr]()
        it.foreach { w =>
          val u = UTF8String.fromString(w)
          var d = 0
          while (d < depth) { cms(d * buckets + bucketOf(u, d, buckets)) += 1; d += 1 }
          val c = mg.get(w)
          if (c != null) c.n += 1
          else if (mg.size < capacity) mg.put(w, new Ctr(1))
          else {
            // decrement-all step: drop every counter by one, evict zeros
            val dead = mg.entrySet().iterator()
            while (dead.hasNext) {
              val e = dead.next()
              if (e.getValue.n <= 1) dead.remove() else e.getValue.n -= 1
            }
          }
        }
        val cells = for {
          d <- (0 until depth).iterator
          b <- (0 until buckets).iterator
          if cms(d * buckets + b) != 0L
        } yield SketchRow(null, d, b.toLong, Some(cms(d * buckets + b)))
        import scala.jdk.CollectionConverters._
        val probes = mg.keySet().iterator().asScala.flatMap { w =>
          val u = UTF8String.fromString(w)
          (0 until depth).map(d => SketchRow(w, d, bucketOf(u, d, buckets).toLong, None))
        }
        cells ++ probes
      }
    emitted.toDF()
  }

  /** (value, est_count) for candidates whose CMS estimate ≥
    * `minCount`, ordered by estimate descending.
    */
  def frequentWords(s: SparkSession, words: DataFrame, col_ : String,
      buckets: Int = 1 << 12, depth: Int = 3,
      capacity: Int = 4096, minCount: Long = 100): DataFrame = {
    // every aggregation below runs over the bounded emission, never the
    // corpus: global cell count = sum of partial cells; a candidate's
    // estimate = MIN over the depth cells its probes landed in (each
    // probe's group always contains at least the emitting partition's
    // own cell row, so no candidate is lost to an empty group)
    val cellAgg = emit(s, words, col_, buckets, depth, capacity)
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("c")).as("cell"), collect_set(col("word")).as("ws"))
    // the estimation input is ≤ depth×buckets cell groups carrying
    // ≤ scanPartitions×capacity×depth candidate probes. On a
    // test-scale scan (few input splits) that's a few thousand rows:
    // collapse the rest of the query into ONE task via a narrow
    // coalesce — a single partition satisfies every downstream
    // distribution requirement, so the value-min, filter, and sort all
    // run exchange-free in one stage instead of three (each exchange
    // on tiny data is pure scheduling overhead). On a wide scan the
    // candidate union can be partitions×capacity large, so stay
    // distributed and pay the value shuffle + global sort.
    val fewPartitions = words.rdd.getNumPartitions <= 64
    val est = (if (fewPartitions) cellAgg.coalesce(1) else cellAgg)
      .select(explode(col("ws")).as("value"), col("cell"))
      .groupBy(col("value"))
      .agg(min(col("cell")).as("est_count"))
      .filter(col("est_count") >= minCount)
    if (fewPartitions)
      est.sortWithinPartitions(col("est_count").desc, col("value").asc)
    else est.orderBy(col("est_count").desc, col("value").asc)
  }
}
