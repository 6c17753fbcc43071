package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's whole dataflow (SURVEY §2.1 O1–O14) as one declarative
  * Spark plan. Semantics per reference:
  *
  *  - tokenize on whitespace            (`src/mapper.c:38-55`)
  *  - keep alphabetic chars, lowercase  (`src/mapper.c:56-64`)
  *  - drop empty tokens                 (`src/mapper.c:66-69`)
  *  - per-file distinct                 (`src/mapper.c:71-97`)
  *  - word → sorted distinct file IDs   (`src/reducer.c:42-105`)
  *
  * Everything is Catalyst built-ins ⇒ WholeStageCodegen end-to-end, with
  * map-side partial aggregation playing the role of the reference's
  * hand-rolled per-file dedup (the `collect_set` partial agg dedups
  * before shuffle, so shuffle volume is distinct (word, file_id) pairs,
  * exactly what the reference ships between its stages).
  *
  * Scale posture: one shuffle, hash-partitioned on `word` — the
  * reference's 26-way letter-modulo partitioning is an implementation
  * accident with Zipfian skew and is NOT reproduced (SURVEY §7.6).
  * Posting lists are bounded by document count per word; for corpora
  * where single-word posting lists outgrow executor memory the fallback
  * is a sort-based aggregation (`repartition(word).sortWithinPartitions`
  * + streaming merge), not needed at any tested scale.
  */
object InvertedIndex {

  /** Normalize a token the way the reference does: strip everything
    * non-alphabetic, lowercase (`That's`→`thats`, `abc123`→`abc`).
    */
  def normalizeToken(c: Column): Column =
    lower(regexp_replace(c, "[^A-Za-z]+", ""))

  /** (file_id, value) lines → (word, file_id) distinct pairs. */
  def wordFilePairs(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("value"), "\\s+")).as("tok"), col("file_id"))
      .select(normalizeToken(col("tok")).as("word"), col("file_id"))
      .filter(length(col("word")) > 0)

  /** (file_id, value) lines → (word, file_ids ARRAY<INT> ascending). */
  def build(docs: DataFrame): DataFrame =
    wordFilePairs(docs)
      .groupBy("word")
      .agg(array_sort(collect_set(col("file_id"))).as("file_ids"))

  /** Index rows in the reference's global output order:
    * (#files DESC, word ASC) — `src/reducer.c:108`, `src/utils.c:20-29`.
    */
  def ordered(index: DataFrame): DataFrame =
    index.orderBy(size(col("file_ids")).desc, col("word").asc)

  /** Formatted output line `word:[1 2 3]` (`src/reducer.c:132-139`). */
  def formattedLine(word: Column, fileIds: Column): Column =
    format_string("%s:[%s]", word,
      array_join(transform(fileIds, _.cast("string")), " "))
}
