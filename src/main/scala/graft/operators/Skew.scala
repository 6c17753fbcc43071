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

  /** Hot-key-salted canonical join: attach `right`'s payload to every
    * `left` row by `key`, where `right` has EXACTLY ONE row per key
    * plus a `grp_n` column holding left's row count for that key (the
    * aggregate that builds such a `right` produces the count for free).
    *
    * Keys with `grp_n > hotGroup` — a set bounded above by n/hotGroup
    * rows, in practice the handful of degenerate fingerprints a web
    * corpus always has (empty docs, boilerplate) — are salted across
    * `salts` reducers: the hot-key list broadcasts to both sides, hot
    * left rows get `hash(saltSource) % salts`, hot right rows replicate
    * once per salt, cold rows ride salt 0 unreplicated. The join key
    * becomes (key, _salt), so no reducer can receive more than
    * ~max(hotGroup, grp_n/salts) rows of any one key — DETERMINISTIC
    * skew-safety, not a runtime bet.
    *
    * Why not rely on AQE's skew join: `OptimizeSkewedJoin` only
    * rewrites `SortMergeJoin(Sort(ShuffleStage), Sort(ShuffleStage))`
    * where both stages' shuffles have ENSURE_REQUIREMENTS origin
    * (OptimizeSkewedJoin.ShuffleStage's unapply). In the canonical-map
    * shape the right side is `Sort(HashAggregate(ShuffleStage))` — the
    * final aggregate sits between the sort and the shuffle stage, so
    * the pattern never matches and the hot fingerprint lands in one
    * unsplittable task (an explicit `repartition(key)` doesn't help
    * either: its shuffle origin is REPARTITION_BY_COL, which the
    * extractor also rejects). Verified empirically on Spark 4.1.
    *
    * Cost shape (measured in the executed plan): THREE column-pruned
    * source scans — the salted left, the salted right aggregate, and
    * the hot-list aggregate. Exchange reuse cannot collapse the two
    * aggregates: column pruning specializes the hot branch to the key
    * and count only (dropping the payload min), so the exchanges are
    * not canonically equal. The hot branch is therefore the cheapest
    * possible full pass; a 100 TB deployment would persist/bucket the
    * (key, payload) projection once and make all three branches
    * metadata-cheap, which is a storage-layout decision this
    * stateless operator deliberately leaves to the caller.
    */
  def hotKeyJoin(left: DataFrame, right: DataFrame, key: String,
      saltSource: Column, hotGroup: Int = 100000, salts: Int = 64): DataFrame = {
    // fail fast at the API boundary: salts = 0 would null the hot
    // salts (pmod by zero) and empty the hot fan-out sequence —
    // silently dropping every hot key's rows from the join
    require(salts >= 1, s"salts must be >= 1 (got $salts)")
    require(hotGroup >= 1, s"hotGroup must be >= 1 (got $hotGroup)")
    // ... and so would scratch-column collisions: a left/right already
    // carrying _salt or _hot would be silently overwritten (wrong
    // salting) or made ambiguous, and grp_n on the left would shadow
    // the contract column the right is required to carry
    for (c <- Seq("_salt", "_hot")) {
      require(!left.columns.contains(c), s"left must not contain scratch column $c")
      require(!right.columns.contains(c), s"right must not contain scratch column $c")
    }
    require(!left.columns.contains("grp_n"), "left must not contain grp_n (right's contract column)")
    require(right.columns.contains("grp_n"), "right must carry grp_n (left row count per key)")
    // only the LEFT side needs the broadcast hot-key list (its rows
    // don't know their group size); the right side reads hotness off
    // its own grp_n column and fans out in a plain projection
    val hot = broadcast(
      right.filter(col("grp_n") > hotGroup).select(col(key), lit(1L).as("_hot")))
    val saltedLeft = left.join(hot, Seq(key), "left")
      .withColumn("_salt", when(col("_hot").isNotNull,
        pmod(xxhash64(saltSource), lit(salts.toLong))).otherwise(lit(0L)))
      .drop("_hot")
    val saltedRight = right
      .withColumn("_salt", explode(when(col("grp_n") > hotGroup,
        sequence(lit(0L), lit(salts - 1L))).otherwise(sequence(lit(0L), lit(0L)))))
      .drop("grp_n")
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
