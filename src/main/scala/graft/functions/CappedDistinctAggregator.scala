package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** `collect_set` with a hard per-group size bound — for df-gated
  * blocking aggregations of the form
  * `groupBy(key).agg(collect_set(id)).filter(size <= cap)`.
  *
  * Why this exists: plain `collect_set` materializes the FULL distinct
  * set before the size filter drops it, so one structural-boilerplate
  * group (a zero-padding window shared by the whole corpus — exactly
  * the case the df cap exists for) builds an aggregation buffer
  * proportional to corpus size at audit scale. This Aggregator stops
  * growing at `cap + 1` elements: enough to PROVE the group is
  * over-cap (the caller's `size <= cap` filter drops it), a constant
  * bound on every partial and merged buffer otherwise.
  *
  * Exactness contract: a group whose true distinct count is ≤ cap is
  * collected EXACTLY (no partial can exceed the true set, so no merge
  * ever hits the bound); a group over cap yields SOME (cap+1)-element
  * subset — callers must filter on `size(...) <= cap`, after which the
  * output is indistinguishable from uncapped collect_set. The buffer
  * is an ascending-sorted distinct Vector (binary-search insert,
  * two-pointer merge — both associative/commutative as partial
  * aggregation requires), so the result needs no `array_sort`.
  */
final class CappedDistinctAggregator(cap: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(cap > 0, s"cap must be positive, got $cap")
  private val bound = cap + 1

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == x) buf // already present
    else if (buf.length >= bound) buf // over-cap: provably droppable
    else (buf.take(lo) :+ x) ++ buf.drop(lo)
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0; var n = 0
    while (n < bound && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      if (takeA) {
        if (j < b.length && a(i) == b(j)) j += 1 // dedupe equal heads
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
