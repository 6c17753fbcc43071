package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fuzzy record linkage (entity resolution) over the `part` catalog —
  * the blocking → length-filter → edit-distance-verify pipeline every
  * dedup/MDM system runs, expressed relationally so the verify cost is
  * ∝ candidate pairs, never all pairs.
  *
  *  - BLOCK on the head noun (last whitespace token of `p_name`): two
  *    names that disagree on their noun are never the same entity, so
  *    the quadratic pair space shrinks to per-block fan-out.
  *  - LENGTH FILTER inside the block: `levenshtein(a, b) <= k` implies
  *    `|len(a) - len(b)| <= k`, so the cheap byte-length band prunes
  *    before any distance is computed (the standard q-gram/length
  *    filter from similarity-join literature).
  *  - VERIFY with `levenshtein` — a codegen'd built-in in Spark and a
  *    native function in DuckDB, so the whole operator is EXACTLY
  *    oracle-checkable (integer distance, no float anywhere).
  *
  * Blocks are df-capped (`maxBlock`, mirrored in the oracle — the
  * q_dedup_groups_exact discipline): a noun shared by more rows than
  * the cap is catalog boilerplate whose df² fan-out would dominate,
  * exactly the failure mode the media/window df-gate closes. At 100 TB
  * the same shape runs with a more selective key (noun + brand, or
  * MinHash over name q-grams feeding [[Dedup]]'s LSH) — the cap is the
  * safety net, not the strategy.
  */
object EntityResolution {

  /** Matched pairs with their edit distance (`maxDist` default 2:
    * one typo + one substitution). Deterministic pair orientation
    * (`key_a < key_b`); ordered output. */
  def fuzzyParts(s: SparkSession, dir: String,
      maxDist: Int = 2, maxBlock: Int = 10000): DataFrame = {
    val parts = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        element_at(split(col("p_name"), " "), -1).as("blk"),
        length(col("p_name")).as("len"))
    val keep = parts.groupBy(col("blk")).agg(count(lit(1)).as("bdf"))
      .filter(col("bdf") >= 2 && col("bdf") <= maxBlock)
      .select(col("blk"))
    val blocked = parts.join(keep, Seq("blk"))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= maxDist)
      .select(col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
        col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("edit_dist"))
      .orderBy(col("key_a"), col("key_b"))
  }

  /** DuckDB restatement — same block key, band filter, cap and
    * distance bound, so the result is hash-identical. */
  def fuzzyPartsOracleSql(maxDist: Int = 2, maxBlock: Int = 10000): String =
    s"""WITH p AS (
       |  SELECT p_partkey, p_name,
       |         list_extract(string_split(p_name, ' '), -1) AS blk,
       |         length(p_name) AS len
       |  FROM part
       |), keep AS (
       |  SELECT blk FROM p GROUP BY blk
       |  HAVING count(*) >= 2 AND count(*) <= $maxBlock
       |), blocked AS (
       |  SELECT p.* FROM p JOIN keep USING (blk)
       |)
       |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       |       a.p_name AS name_a, b.p_name AS name_b,
       |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
       |FROM blocked a JOIN blocked b
       |  ON a.blk = b.blk AND a.p_partkey < b.p_partkey
       | AND abs(a.len - b.len) <= $maxDist
       |WHERE levenshtein(a.p_name, b.p_name) <= $maxDist
       |ORDER BY key_a, key_b""".stripMargin
}
