package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Round-14 scale/robustness work. The DuckDB oracle gate re-checks
  * the exact outputs; these specs pin what the oracle can't — the
  * NO-MISS property of the reworked exact-media candidate generation
  * and the physical shape that makes it scale (one grouping shuffle,
  * map-side pair generation, no pre-verify shuffle join).
  */
class Round14Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // --- q_media_neardups_exact: gram-keyed candidate generation ------

  /** In-test brute recompute of the candidate semantics: the set of
    * ordered media pairs sharing ANY stride-4 16-byte window whose
    * corpus-wide distinct-media frequency is in [2, maxDf]. Plain
    * Scala over collected payloads — no Spark machinery shared with
    * the operator under test.
    */
  private def refWindowPairs(maxDf: Int): Set[(Long, Long)] = {
    val payloads = Multimodal.mediaTable(spark, sf)
      .select(col("media_id"), col("content")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
    val byWin = scala.collection.mutable.Map.empty[Seq[Byte], Set[Long]]
    payloads.foreach { case (id, bytes) =>
      val last = math.max(bytes.length - 16, 0)
      (0 to last by 4).foreach { p =>
        if (p + 16 <= bytes.length) {
          val w = bytes.slice(p, p + 16).toSeq
          byWin(w) = byWin.getOrElse(w, Set.empty) + id
        }
      }
    }
    byWin.values
      .filter(ms => ms.size >= 2 && ms.size <= maxDf)
      .flatMap(ms => ms.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
  }

  test("exact media near-dup candidates: the grouped-set generation is " +
    "NO-MISS vs a brute window-share recount (and no extras)") {
    // threshold 0 keeps every candidate in the output, exposing the
    // candidate set itself through the public operator
    val got = Multimodal.mediaNearDupsExact(spark, sf, threshold = 0.0)
      .select(col("media_a"), col("media_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = refWindowPairs(maxDf = 64)
    val missed = want -- got
    val extra = got -- want
    assert(missed.isEmpty, s"dropped window-sharing pairs: ${missed.take(5)}")
    assert(extra.isEmpty, s"phantom candidates: ${extra.take(5)}")
    assert(want.nonEmpty, "fixture produced no window-sharing pairs")
  }

  test("exact media near-dup plan: candidates come from ONE grouping " +
    "shuffle with map-side pair generation — the only joins are the " +
    "broadcast verification lookups") {
    val plan = Multimodal.mediaNearDupsExact(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "candidate generation must not shuffle-join the window relation " +
        "(the 7.07x/decade r13 shape)")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "no unkeyed join may appear")
    assert(plan.contains("BroadcastHashJoin"),
      "histogram verification lookups must broadcast")
    // exactly one aggregate keyed on the raw window bytes (the df gate
    // rides on the grouped set — no second full-window pass)
    val winAggs = plan.split("\n").count(l =>
      l.contains("HashAggregate") && l.contains("keys=[win"))
    assert(winAggs == 2, // partial + final of the ONE grouping
      s"expected one partial+final window aggregate pair, saw $winAggs")
  }
}
