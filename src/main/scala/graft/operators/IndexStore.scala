package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized inverted index: the serving-side counterpart of the
  * build pipeline. At 100 TB the index is not a set of text files —
  * it's a parquet table partitioned by first letter, so a posting
  * lookup prunes to ONE partition directory and a scan of one
  * word-range (verified via `PartitionFilters` in IndexStoreSpec).
  *
  * Letter partitioning mirrors the reference's output organization
  * (O15) but as a queryable table; the reference's skew concern
  * (Zipfian letters) applies to FILE SIZES only, not parallelism —
  * scans within a partition are still split by row group.
  */
object IndexStore {

  /** Build + persist the index partitioned by letter. */
  def materialize(docs: DataFrame, path: String): Unit =
    InvertedIndex.build(docs)
      .withColumn("letter", substring(col("word"), 1, 1))
      .write.mode("overwrite")
      .partitionBy("letter")
      .parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Point lookup: the letter predicate is derivable from the word but
    * Catalyst can't know that — supply it explicitly so partition
    * pruning kicks in (reads 1 of 26 directories).
    */
  def lookup(spark: SparkSession, path: String, word: String): DataFrame =
    load(spark, path)
      .filter(col("letter") === word.substring(0, 1) && col("word") === word)
      .select(col("word"), col("file_ids"))
}
