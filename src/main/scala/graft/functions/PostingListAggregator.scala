package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` building a sorted-distinct posting list — the
  * reference's reducer accumulation (`src/reducer.c:42-105`: collect
  * distinct file IDs per word, ascending) as a first-class Spark UDAF.
  *
  * The built-in `array_sort(collect_set(...))` covers the same
  * semantics (and is what the core pipeline uses); this Aggregator is
  * the extension-point demonstration (SURVEY §2.2 UDF/UDAF row) and the
  * streaming-safe form: both `reduce` and `merge` keep the buffer
  * sorted+distinct, so partial states are bounded and mergeable in any
  * order — exactly what a map-side combine / streaming state store
  * needs.
  */
object PostingListAggregator extends Aggregator[Int, Seq[Int], Seq[Int]] {

  override def zero: Seq[Int] = Vector.empty

  override def reduce(buf: Seq[Int], id: Int): Seq[Int] = {
    val i = lowerBound(buf, id)
    if (i < buf.length && buf(i) == id) buf
    else (buf.take(i) :+ id) ++ buf.drop(i)
  }

  override def merge(a: Seq[Int], b: Seq[Int]): Seq[Int] = {
    // merge two sorted-distinct lists
    val out = Vector.newBuilder[Int]
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out += a(i); i += 1 }
      else if (a(i) > b(j)) { out += b(j); j += 1 }
      else { out += a(i); i += 1; j += 1 }
    }
    while (i < a.length) { out += a(i); i += 1 }
    while (j < b.length) { out += b(j); j += 1 }
    out.result()
  }

  override def finish(buf: Seq[Int]): Seq[Int] = buf

  override def bufferEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()

  private def lowerBound(buf: Seq[Int], id: Int): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < id) lo = mid + 1 else hi = mid
    }
    lo
  }
}