package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native dot product over two `array<double>` columns.
  *
  * Spark has no built-in vector dot; the composable alternative
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) runs through the
  * interpreted `ArrayAggregate`/`ArrayZipWith` higher-order functions —
  * measured 132 s for the all-pairs similarity pass at sf0.1. This
  * expression generates a tight primitive loop inside WholeStageCodegen
  * (SURVEY §4.3 preference order: custom `Expression` before
  * `mapPartitions`), with an interpreted `nullSafeEval` fallback.
  *
  * Summation is sequential left-to-right — the same order as the HOF
  * version and DuckDB's list functions, so results stay bit-identical
  * with the oracle.
  *
  * Null semantics match the HOF form exactly (required for the
  * [[graft.plans.RewriteHofDotProduct]] rewrite to be
  * semantics-preserving): unequal lengths → NULL (zip_with null-pads,
  * poisoning the sum), any null element → NULL.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 0-based index of the nearest centroid by cosine: argmax over i of
  * `dot(emb, cEmbs[i]) / cNrms[i]` (the query vector's own norm is a
  * constant positive scale across candidates, so it drops out of the
  * argmax and is not an input). Ties break to the LOWEST index, making
  * the result total and deterministic.
  *
  * This is the cell-assignment primitive of the IVF/dedup family: with
  * the (small, broadcast) centroid set attached as array literals-per-
  * row, assignment becomes a NARROW projection — no corpus×C row
  * explosion, no `row_number` window shuffling the exploded set, not
  * even the n-row shuffle a `groupBy(vec_id).agg(max_by(...))` reduction
  * would pay. One tight codegen'd loop per row inside WholeStageCodegen
  * (SURVEY §4.3 preference order), interpreted `nullSafeEval` fallback.
  *
  * NULL on: any null input/element, empty centroid list, dimension
  * mismatch, or no finite score (e.g. all cNrms zero → NaN scores,
  * which never beat the running max).
  */
case class NearestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires (array<double>, array<array<double>>, array<double>), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}")
  }

  override def nullSafeEval(e: Any, ce: Any, cn: Any): Any = {
    val emb = e.asInstanceOf[ArrayData]
    val cEmbs = ce.asInstanceOf[ArrayData]
    val cNrms = cn.asInstanceOf[ArrayData]
    val c = cEmbs.numElements()
    if (c == 0 || c != cNrms.numElements()) return null
    val d = emb.numElements()
    var best = Double.NegativeInfinity
    var bestIdx = -1
    var i = 0
    while (i < c) {
      if (cEmbs.isNullAt(i) || cNrms.isNullAt(i)) return null
      val cemb = cEmbs.getArray(i)
      if (cemb.numElements() != d) return null
      var s = 0.0
      var j = 0
      while (j < d) {
        if (emb.isNullAt(j) || cemb.isNullAt(j)) return null
        s += emb.getDouble(j) * cemb.getDouble(j)
        j += 1
      }
      val score = s / cNrms.getDouble(i)
      if (score > best) { best = score; bestIdx = i }
      i += 1
    }
    if (bestIdx < 0) null else bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, ce, cn) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val cemb = ctx.freshName("cemb")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      s"""
         |int $c = $ce.numElements();
         |int $d = $e.numElements();
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bestIdx = -1;
         |if ($c == 0 || $c != $cn.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $c; $i++) {
         |    if ($ce.isNullAt($i) || $cn.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    org.apache.spark.sql.catalyst.util.ArrayData $cemb = $ce.getArray($i);
         |    if ($cemb.numElements() != $d) { ${ev.isNull} = true; break; }
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $d; $j++) {
         |      if ($e.isNullAt($j) || $cemb.isNullAt($j)) { ${ev.isNull} = true; break; }
         |      $s += $e.getDouble($j) * $cemb.getDouble($j);
         |    }
         |    if (${ev.isNull}) break;
         |    double $score = $s / $cn.getDouble($i);
         |    if ($score > $best) { $best = $score; $bestIdx = $i; }
         |  }
         |  if ($bestIdx < 0) ${ev.isNull} = true;
         |}
         |${ev.value} = $bestIdx;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level API. The expressions are registered in the session
  * function registry (idempotent) and invoked by name via
  * `call_function`, which keeps this code independent of the
  * Column-construction internals that changed in Spark 4.
  */
object VectorFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cell", exprs => NearestCell(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  def arrayDot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  def l2Norm(a: Column): Column = sqrt(arrayDot(a, a))

  def nearestCell(emb: Column, cEmbs: Column, cNrms: Column): Column =
    call_function("nearest_cell", emb, cEmbs, cNrms)
}
