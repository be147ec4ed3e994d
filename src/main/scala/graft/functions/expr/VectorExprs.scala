package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY §2 has no
  * need for custom expressions; these exist for the LLM-pipeline
  * similarity operators, where the generic higher-order-function fold
  * (`aggregate(zip_with(a,b,*),0.0,+)`) is evaluated interpreted —
  * per-element lambda dispatch and a materialized product array per row.
  * At 100 TB the dot product IS the inner loop, so it gets `doGenCode`:
  * a fused primitive double loop inside whole-stage codegen, no
  * allocation, no virtual calls.
  *
  * Arithmetic contract: identical IEEE operation ORDER to the HOF fold
  * (acc = (acc + a(i)*b(i)) left-to-right), so results are bit-identical
  * to CrossEngine.dotFold and the DuckDB oracle fold — verified by
  * VectorExprsSpec. Null contract mirrors zip_with+aggregate: null
  * array -> null; mismatched lengths -> null (zip_with would pad with
  * null and poison the sum).
  */
abstract class VectorFold extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Java source for one loop step, given element vars `x` and `y`.
    * Any locals must come from `ctx.freshName` — the step is spliced
    * into generated code whose enclosing scope it cannot see. */
  protected def stepJava(ctx: CodegenContext, acc: String, x: String, y: String): String
  /** Interpreted step — must match stepJava exactly. */
  protected def stepEval(acc: Double, x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = xs.numElements()
      while (i < n) {
        acc = stepEval(acc, xs.getDouble(i), ys.getDouble(i))
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($xs.numElements() != $ys.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $xs.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${stepJava(ctx, acc, s"$xs.getDouble($i)", s"$ys.getDouble($i)")}
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Sequential-fold dot product: acc += a(i) * b(i), left to right. */
case class DotFold(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_dot"
  override protected def stepJava(ctx: CodegenContext, acc: String, x: String, y: String): String =
    s"$acc = $acc + $x * $y;"
  override protected def stepEval(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared L2 distance: acc += (a(i)-b(i))^2. */
case class SqDistFold(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "graft_sqdist"
  override protected def stepJava(ctx: CodegenContext, acc: String, x: String, y: String): String = {
    val d = ctx.freshName("d")
    s"double $d = $x - $y; $acc = $acc + $d * $d;"
  }
  override protected def stepEval(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistFold =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** The fold constants must be plan-time literals (they're spliced
    * into generated Java as constants). */
  private def litLong(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case _ => throw new IllegalArgumentException(
      s"graft_bytefold: $what must be an integer literal, got $e")
  }

  /** (name, info, builder) triples for SparkSessionExtensions.injectFunction. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotFold(es(0), es(1))),
    "graft_sqdist" -> (es => SqDistFold(es(0), es(1))),
    "graft_bytefold" -> (es => ByteFold(es(0), es(1), es(2),
      litLong(es(3), "mult"), litLong(es(4), "mod"))),
    "graft_bytemax" -> (es => ByteMax(es(0), es(1), es(2))))

  def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[VectorFold].getName, name)
}
