package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The audio spectral frame feature as a NATIVE kernel — the whole
  * per-track feature array in one pass.
  *
  * The first cut composed the integer DFT from SQL expressions
  * (16 bins × 16 unrolled multiply-adds + three array constructions
  * per frame inside nested higher-order lambdas); correct, but the
  * expression tree was enormous and the battery paid 3.4× on every
  * fingerprint-side audio query. This expression walks the decoded
  * PCM string once with primitive loops — the per-frame cost is ~256
  * long MACs with zero allocations beyond the output array — and
  * plugs into whole-stage codegen as a single static call.
  *
  * Semantics are IDENTICAL to the expression form (and to the DuckDB
  * oracle's restatement, which shares the coefficient table): frames
  * of [[FrameLen]] CODEPOINTS (the payloads decode to strings; char
  * position semantics match `substr`/`ascii`), integer bin magnitudes
  * from the round(1024·cos/sin) table, peak/runner-up with ties to
  * the LOWEST bin, ratio buckets at 2×/4×/8×, feature byte
  * (b1−1)·32 + (b2−1)·4 + r.
  */
object AudioFeature {

  val FrameLen = 16
  val DftBins = 8
  private val DftScale = 1024L

  /** THE coefficient table — [[graft.operators.AudioMatch]] embeds
    * these same values as literals in the generated oracle SQL. */
  val CRe: Array[Array[Long]] = Array.tabulate(DftBins, FrameLen)((b, k) =>
    math.round(DftScale * math.cos(2 * math.Pi * (b + 1) * k / FrameLen)))
  val CIm: Array[Array[Long]] = Array.tabulate(DftBins, FrameLen)((b, k) =>
    math.round(DftScale * math.sin(2 * math.Pi * (b + 1) * k / FrameLen)))

  /** Per-frame spectral feature bytes of a PCM string (one long per
    * FULL frame; the partial tail frame is dropped). Public static so
    * generated code calls it directly. */
  def compute(pcm: UTF8String): ArrayData = {
    val str = pcm.toString
    val nF = str.length / FrameLen
    val out = new Array[Long](nF)
    val mag = new Array[Long](DftBins)
    var f = 0
    while (f < nF) {
      val base = f * FrameLen
      var b = 0
      while (b < DftBins) {
        val cr = CRe(b); val ci = CIm(b)
        var re = 0L; var im = 0L; var k = 0
        while (k < FrameLen) {
          val v = str.charAt(base + k).toLong
          re += v * cr(k); im += v * ci(k)
          k += 1
        }
        mag(b) = re * re + im * im
        b += 1
      }
      // peak and runner-up, ties to the LOWEST bin (strict > keeps the
      // first maximum; a value tying the peak stays eligible as
      // runner-up — same semantics as the oracle's row_number order)
      var b1 = 0; b = 1
      while (b < DftBins) { if (mag(b) > mag(b1)) b1 = b; b += 1 }
      var b2 = if (b1 == 0) 1 else 0
      b = 0
      while (b < DftBins) {
        if (b != b1 && mag(b) > mag(b2)) b2 = b
        b += 1
      }
      val m1 = mag(b1); val m2 = mag(b2)
      val r = (if (m1 >= 2 * m2) 1L else 0L) + (if (m1 >= 4 * m2) 1L else 0L) +
        (if (m1 >= 8 * m2) 1L else 0L)
      out(f) = b1.toLong * 32L + b2.toLong * 4L + r
      f += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `spectral_features(pcm)` — array<long> of per-frame feature bytes.
  * Codegen emits one static call into [[AudioFeature.compute]]; the
  * interpreted path shares the same kernel.
  */
case class SpectralFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "spectral_features"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis
        .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"spectral_features requires string, got " +
          other.simpleString)
    }

  override def nullSafeEval(s: Any): Any =
    AudioFeature.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioFeature.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
