package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product (SURVEY.md B51).
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` is CodegenFallback — every
  * element bounces through interpreted `Expression.eval`, which dominated
  * the similarity-search bench queries. This expression stays inside
  * whole-stage codegen (`doGenCode` emits a tight primitive loop) and falls
  * back to an equally tight JVM loop in interpreted mode. Summation order is
  * the same left fold as the HOF version, so results are bit-identical.
  *
  * Registered as SQL function `vec_dot` via [[SparkSessionExtensions]] (see
  * [[graft.Sessions]]) — the public extension point. Inputs are coerced to
  * `array<double>` by the registered builder (`ImplicitCastInputTypes` needs
  * the private[sql] AbstractDataType, so coercion lives in the builder
  * instead). Children are assumed element-non-null (embedding vectors).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int vecDotN = java.lang.Math.min($a.numElements(), $b.numElements());
         |double vecDotS = 0.0;
         |for (int vecDotI = 0; vecDotI < vecDotN; vecDotI++) {
         |  vecDotS += $a.getDouble(vecDotI) * $b.getDouble(vecDotI);
         |}
         |${ev.value} = vecDotS;
         |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private val toVec: Expression => Expression = {
    case e if e.dataType == ArrayType(DoubleType, containsNull = false) => e
    case e => Cast(e, ArrayType(DoubleType))
  }

  /** Inject the vector functions into a session being built. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(toVec(children.head), toVec(children(1)))))
}
