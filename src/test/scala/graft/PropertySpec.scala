package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PostingListAggregator

/** Property tests (SURVEY §5 plan): algebraic invariants that must
  * hold for the engine to be correct under ANY partitioning — the
  * merge laws are exactly what Spark exercises when it combines
  * partial aggregates in arbitrary order.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val idList = Gen.listOf(Gen.chooseNum(1, 500))

  test("posting-list aggregator: reduce keeps sorted-distinct") {
    check(Prop.forAll(idList) { ids =>
      val buf = ids.foldLeft(PostingListAggregator.zero)(PostingListAggregator.reduce)
      buf == ids.distinct.sorted
    })
  }

  test("posting-list aggregator: merge is commutative and associative") {
    def build(ids: List[Int]) =
      ids.foldLeft(PostingListAggregator.zero)(PostingListAggregator.reduce)
    check(Prop.forAll(idList, idList, idList) { (x, y, z) =>
      val (a, b, c) = (build(x), build(y), build(z))
      val m = PostingListAggregator.merge _
      m(a, b) == m(b, a) && m(m(a, b), c) == m(a, m(b, c)) &&
        m(a, b) == (x ++ y).distinct.sorted
    })
  }

  test("token normalization is idempotent and in [a-z]*") {
    val norm: String => String = s => s.filter(c => c.isLetter && c < 128).toLowerCase
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = norm(s)
      norm(once) == once && once.forall(c => c >= 'a' && c <= 'z')
    })
  }

  test("simhash-style bit voting is order-independent") {
    check(Prop.forAll(Gen.listOf(Gen.long)) { hs =>
      def vote(l: List[Long]): Seq[Int] =
        (0 until 64).map(i => l.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum)
      vote(hs) == vote(hs.reverse)
    })
  }

  test("posting codec: decode(encode(xs)) == xs for all Long lists") {
    import graft.functions.PostingCodec
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    check(Prop.forAll(Gen.listOf(Gen.long)) { xs =>
      val enc = PostingCodec.encode(new GenericArrayData(xs.toArray))
      PostingCodec.decode(enc).toLongArray().toList == xs
    })
  }

  test("posting codec: sorted dense lists never exceed raw size") {
    import graft.functions.PostingCodec
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // ascending non-negative ids with bounded gaps — the posting-list
    // contract — must never encode larger than 8 B/posting
    val sortedIds = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1L << 40))
      .map(_.sorted.distinct)
    check(Prop.forAll(sortedIds) { xs =>
      PostingCodec.encode(new GenericArrayData(xs.toArray)).length <= xs.length * 8
    })
  }

  test("posting codec: corrupt 10th varint byte is rejected, not folded") {
    import graft.functions.PostingCodec
    // nine continuation groups then a final byte whose payload bits above
    // bit 0 don't fit in a Long: must raise, never decode to a wrong value
    val nine = Array.fill(9)(0x80.toByte)
    for (last <- Seq(0x7e, 0x02, 0x82, 0xff)) {
      val corrupt = nine :+ last.toByte
      val e = intercept[IllegalArgumentException](PostingCodec.decode(corrupt))
      assert(e.getMessage.contains("overlong or corrupt"), s"last=$last")
    }
    // while the two VALID 10th bytes still decode
    for (last <- Seq(0x00, 0x01)) {
      PostingCodec.decode(nine :+ last.toByte) // must not throw
    }
  }
}
