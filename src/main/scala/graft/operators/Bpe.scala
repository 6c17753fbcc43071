package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Byte-pair-encoding merge training (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-vocabulary learning step of a
  * training-data pipeline, distributed the way production BPE trainers
  * actually run it.
  *
  * SCALE SHAPE — iterate on the WORD-FREQUENCY DICTIONARY, never the
  * corpus. The corpus is scanned exactly once (word counts); every
  * merge round then runs over the distinct-word relation — vocab-sized
  * (millions of rows at web scale, 31 here), orders of magnitude
  * smaller than the corpus — because a pair's corpus frequency is
  * exactly `sum(word_count · occurrences_in_word)`. This is the same
  * verify-on-distinct-values factorization as
  * [[EntityResolution]]: per-round cost is bounded by vocabulary, so
  * the k-round loop costs k · O(vocab) after one corpus scan, not
  * k · O(corpus).
  *
  * Per round (driver loop, pagerank discipline — persist the new
  * dictionary state, materialize, unpersist the old):
  *  1. adjacent-pair counts: explode each word's symbol sequence into
  *     (sym[i], sym[i+1]) pairs weighted by the word's corpus count —
  *     a narrow map + one vocab-sized hash aggregation;
  *  2. argmax pair via `orderBy(...).limit(1)` — planned as
  *     `TakeOrderedAndProject` (per-partition top-1, merged on the
  *     driver), never a global sort. Ties break deterministically by
  *     (count DESC, lhs ASC, rhs ASC);
  *  3. rewrite every word's symbol sequence with the winning merge —
  *     a greedy left-to-right fold (`aggregate` higher-order
  *     function, codegen'd): non-overlapping occurrences merge
  *     left-first, the classic BPE application order.
  *
  * Driver state is k merge rows + per-round loop control — bounded by
  * the requested vocabulary size, independent of data scale (the same
  * contract as [[Graphs.pageRank]]'s iteration scalars).
  *
  * Determinism: integer pair counts (exact under any aggregation
  * order), total-order tie-break, greedy fold — the DuckDB oracle
  * replays all three bit-for-bit as an unrolled CTE chain (one
  * pair-count + argmax + `list_reduce` rewrite block per round, the
  * [[Graphs]] unrolled-oracle pattern).
  *
  * Word model matches [[TrainingPrep.vocabulary]]: lowercased
  * whitespace tokens; each word ends with the `</w>` end-of-word
  * marker so merges can't cross word boundaries and a learned token
  * knows whether it is word-final (the original BPE formulation).
  */
object Bpe {

  private val EndOfWord = "</w>"

  /** Greedy left-to-right application of one merge (l, r) to a symbol
    * sequence: fold symbols into an accumulator, merging when the
    * accumulator's last element is `l` and the incoming symbol is `r`.
    * A merged `l||r` can itself be the left side of a later fold step
    * only in a LATER round (exactly BPE's non-overlapping scan: in
    * "l l l" the first two merge, the third survives).
    */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      typedLit(Seq.empty[String]),
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** (word, cnt, syms) dictionary: one corpus scan, one hash agg. */
  private def dictionary(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    Tables.load(s, dir, "documents")
      .select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        concat(filter(split(col("word"), ""), c => length(c) > 0),
          array(lit(EndOfWord))))
  }

  /** Weighted adjacent-pair counts over the current dictionary. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(expr(
        "transform(slice(syms, 1, size(syms)-1)," +
          " (s, i) -> struct(s AS lhs, element_at(syms, i+2) AS rhs))")).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** The learned merge table: (step, lhs, rhs, merged, pair_count),
    * one row per round, ordered by step. Stops early if the symbol
    * alphabet exhausts before `merges` rounds.
    */
  def bpeTrain(s: SparkSession, dir: String, merges: Int = 8): DataFrame = {
    import s.implicits._
    var words = dictionary(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    words.count()
    val learned = ArrayBuffer.empty[(Int, String, String, String, Long)]
    try {
      var step = 1
      var exhausted = false
      while (step <= merges && !exhausted) {
        val top = pairCounts(words)
          .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          learned += ((step, l, r, l + r, c))
          val next = words
            .withColumn("syms", applyMerge(col("syms"), l, r))
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          words.unpersist()
          words = next
          step += 1
        }
      }
    } finally words.unpersist()
    learned.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
      .orderBy(col("step"))
  }

  /** DuckDB restatement of [[bpeTrain]] as an unrolled CTE chain (the
    * [[Graphs]] unrolled-oracle pattern): per round, a pair-count CTE
    * (`list_zip` of a list with its own tail), a `LIMIT 1` argmax with
    * the same (count DESC, lhs, rhs) tie-break, and a `list_reduce`
    * fold that replays the greedy left-to-right merge — the
    * accumulator is a list-of-symbols built from single-element lists,
    * so the reduce's element type carries the sequence state.
    */
  def bpeTrainOracleSql(merges: Int = 8): String = {
    val base =
      """w0 AS (
        |  SELECT word, cnt, string_split(word, '') || ['</w>'] AS syms FROM (
        |    SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
        |      SELECT unnest(list_filter(
        |        regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS w
        |      FROM documents) GROUP BY 1)
        |)""".stripMargin
    val steps = (1 to merges).map { i =>
      val rewrite =
        if (i == merges) "" // last round never applies its merge
        else
          s""",
             |w$i AS (
             |  SELECT word, cnt,
             |    list_reduce(list_transform(syms, s -> [s]),
             |      (acc, x) -> CASE WHEN acc[-1] = t$i.l AND x[1] = t$i.r
             |                  THEN acc[1:len(acc)-1] || [t$i.l || t$i.r]
             |                  ELSE acc || x END) AS syms
             |  FROM w${i - 1} CROSS JOIN t$i
             |)""".stripMargin
      s"""p$i AS (
         |  SELECT z[1] AS l, z[2] AS r, sum(cnt) AS c
         |  FROM (SELECT cnt, unnest(list_zip(syms, syms[2:])) AS z FROM w${i - 1})
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2
         |),
         |t$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l ASC, r ASC LIMIT 1)$rewrite"""
        .stripMargin
    }
    val out = (1 to merges)
      .map(i => s"SELECT $i AS step, l AS lhs, r AS rhs, l || r AS merged, c AS pair_count FROM t$i")
      .mkString("\nUNION ALL\n")
    s"WITH $base,\n${steps.mkString(",\n")}\n$out\nORDER BY step"
  }
}
