package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 56-bit difference-hash (dHash) of an opaque binary payload — the
  * image-side perceptual fingerprint, the modality analog of the audio
  * spectral feature: the DECODE is a deterministic stand-in (a real
  * deployment downscales decoded pixels to the 7×9 grayscale grid; the
  * container has no codecs, so the grid derives from the payload bytes
  * — the [[graft.operators.Multimodal.DecodeStub]] contract), while
  * everything from the pixel grid onward IS the published dHash
  * algorithm (Krawetz's "Kind of Like That" difference hash).
  *
  * Grid: the payload's bytes split into 63 BALANCED contiguous cells
  * (byte j of n lands in cell ⌊j·63/n⌋ — same integer formula in the
  * DuckDB oracle); a cell's "pixel" is the exact integer SUM of its
  * bytes. Hash: bit b (0..55) is set iff, with r = b/8 and c = b%8,
  * pixel(r·9 + c) > pixel(r·9 + c + 1) — adjacent-pixel comparisons
  * row-wise, the dHash gradient signature. 56 bits, not 64, keeps the
  * packed value inside a signed BIGINT in every engine (DuckDB refuses
  * 1<<63).
  *
  * Why comparisons: a brightness rescale multiplies every pixel sum by
  * the same factor, and adjacent cells have near-equal byte counts, so
  * the `>` relations — the hash — are INVARIANT under gain changes
  * that destroy any absolute-value fingerprint (spec-pinned, the
  * amplitude story of the audio feature replayed for images).
  */
object ImageHash {

  val Cells = 63 // 7 rows × 9 columns
  val RowCells = 9
  val HashBits = 56 // 7 rows × 8 adjacent comparisons

  /** The 56-bit dHash of one payload. Empty payloads hash to 0. */
  def dhash56(content: Array[Byte]): Long = {
    val n = content.length
    if (n == 0) return 0L
    val px = new Array[Long](Cells)
    var j = 0
    while (j < n) {
      // balanced contiguous partition — identical to the oracle's
      // (j * 63) // n on 1-based-minus-1 byte positions
      px((j.toLong * Cells / n).toInt) += content(j) & 0xFF
      j += 1
    }
    var hash = 0L
    var b = 0
    while (b < HashBits) {
      val i = (b / 8) * RowCells + (b % 8)
      if (px(i) > px(i + 1)) hash |= 1L << b
      b += 1
    }
    hash
  }
}

/** `dhash56(content)` over a binary column — one static-call kernel
  * inside whole-stage codegen, interpreted path shared. */
case class DHash56(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash56"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis
        .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"dhash56 requires binary, got ${other.simpleString}")
    }

  override def nullSafeEval(c: Any): Any =
    ImageHash.dhash56(c.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageHash.dhash56($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
