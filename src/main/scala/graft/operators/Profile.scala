package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiler: per-column row/null/distinct counts and min/max,
  * one output row per column — the "describe this table before you
  * mix it into the training set" report every ingest pipeline runs.
  *
  * Shape: ONE pass over the table. Multiple exact `count(DISTINCT)`
  * in a single aggregate compile to an Expand plan (each input row is
  * replicated once per distinct-column), so the scan happens once and
  * the shuffle carries #cols × rows of single-column tuples — the
  * standard exact-ndv trade. At 100 TB you'd flip `exact = false` and
  * the Expand disappears: HLL sketches merge in one ordinary
  * aggregate. Both variants are one scan; only the exact one is
  * DuckDB-hashable, so that's the oracle entry.
  */
object Profile {

  /** Profile fixed columns of `documents`. min/max are cast to string
    * so heterogeneous column types fit one schema (the cast is exact
    * for integers — no float formatting ambiguity).
    */
  def profileDocuments(s: SparkSession, dir: String, exact: Boolean = true): DataFrame = {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val d = Tables.load(s, dir, "documents").select(cols.map(col): _*)
    val ndv = (c: String) =>
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val agg = d.agg(
      count(lit(1)).as("n"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        ndv(c).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))): _*)
    agg.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("n").as("n_rows"),
        (col("n") - col(s"nn_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"min_$c").as("min_val"),
        col(s"max_$c").as("max_val"))): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
