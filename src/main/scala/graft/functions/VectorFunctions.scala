package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, sqrt}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

/** Column-level API. The expression is registered in the session
  * function registry (idempotent) and invoked by name via
  * `call_function`, which keeps this code independent of the
  * Column-construction internals that changed in Spark 4.
  */
object VectorFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")

  def arrayDot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  def l2Norm(a: Column): Column = sqrt(arrayDot(a, a))
}
