package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (sort-key, payload) candidate for a bounded top-k buffer. */
final case class ScoredId(score: Double, id: Long)

/** Bounded-heap per-group top-k as a typed `Aggregator` — the
  * map-side-combinable alternative to the `row_number() OVER (...)
  * <= k` window idiom.
  *
  * Why this exists: the window form shuffles EVERY row of the group to
  * one partition and sorts it before discarding all but k — at 100 TB
  * a top-3-per-segment query moves the whole fact table through one
  * Exchange. This Aggregator keeps a k-bounded, sorted buffer whose
  * `reduce` and `merge` are both order-insensitive, so Spark runs it
  * as a partial ObjectHashAggregate before the shuffle: each map task
  * emits AT MOST k rows per group and the Exchange carries
  * O(groups × k) instead of O(rows). Same answer, ~|fact|/k× less
  * shuffle traffic.
  *
  * Ordering is (score DESC, id ASC) — identical to the window
  * variant's `ORDER BY o_totalprice DESC, o_orderkey` — so with unique
  * ids the result is deterministic and byte-equal to `row_number`'s.
  * The buffer is a descending-sorted Vector capped at k: `reduce` is a
  * binary-search insert (drop-last when over k), `merge` a bounded
  * two-pointer merge; both O(k), associative, and commutative, which
  * is the contract partial aggregation needs.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  /** true when a ranks strictly before b: score desc, id asc. */
  private def before(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    // fast reject: buffer full and x ranks at/after the current last
    if (buf.length >= k && !before(x, buf.last)) buf
    else {
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (before(buf(mid), x)) lo = mid + 1 else hi = mid
      }
      val ins = (buf.take(lo) :+ x) ++ buf.drop(lo)
      if (ins.length > k) ins.take(k) else ins
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    val out = Vector.newBuilder[ScoredId]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && before(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  // ExpressionEncoder rather than Encoders.*: the public factory has no
  // Seq[Product] shape, and a kryo encoder would surface the OUTPUT
  // column as opaque binary instead of array<struct<score,id>>
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
