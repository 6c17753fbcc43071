package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join splitting handles shuffle-join skew at runtime; the
  * two patterns here cover what AQE does not:
  *
  *  - [[saltedAgg]]: a single hot group key overwhelms one reducer in
  *    a `groupBy().agg()`. Two-phase aggregation over (key, salt)
  *    spreads the hot key across `buckets` reducers, then combines the
  *    partials — valid for any algebraic (re-aggregable) aggregate.
  *  - [[saltedJoin]]: a shuffled equi-join where the LEFT side has hot
  *    keys. The left side gets a random salt in [0, buckets); the
  *    right side is replicated `buckets`× with every salt value, so
  *    the join key becomes (key, salt) and the hot key's rows land on
  *    `buckets` different reducers.
  *
  * Salts use a deterministic hash of intra-row columns (never rand():
  * output must be partition-count independent and re-runnable).
  */
object Skew {

  /** Two-phase salted SUM aggregation. `sums` maps output column name →
    * value expression summed in both phases (sum-of-sums re-aggregates
    * exactly); express a count as `sum(lit(1))`. Results equal the
    * unsalted `groupBy(key).agg(...)` exactly (asserted in the spec).
    */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, buckets: Int,
      sums: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(saltSource), lit(buckets)))
    val partialAggs = sums.map { case (name, c) => sum(c).as(name) }.toSeq
    val partial = salted.groupBy(key.as("_key"), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.map(n => sum(col(n)).as(n)).toSeq
    partial.groupBy(col("_key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join: left skewed, right replicated buckets×. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltSource: Column, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", pmod(xxhash64(saltSource), lit(buckets)))
    val replicatedRight = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
        saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt")
  }
}
