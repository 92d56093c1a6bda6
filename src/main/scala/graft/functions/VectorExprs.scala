package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression,
  ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName, not fixed names: nullSafeCodeGen only adds a brace scope
    // when the child is NULLABLE — two instances of this expression over
    // non-null inputs in one codegen method would otherwise redeclare the
    // locals, fail janino, and silently drop the stage to interpreted mode
    val n = ctx.freshName("vecDotN")
    val s = ctx.freshName("vecDotS")
    val i = ctx.freshName("vecDotI")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** All-bands hyperplane-LSH bucket computation in ONE codegen'd pass
  * (SURVEY.md B50/B51): for a `bands × bits` family of deterministic integer
  * hyperplanes, returns an `array<long>` of length `bands` where
  * `bucket[b] = Σ_j (dot(vec, plane(b·bits+j)) > 0) << j`.
  *
  * The plane coefficients are the engine/oracle-shared formula
  * `plane(j)(i) = ((i·73856093 + j·19349663 + i·j·83492791) % prime % 7) − 3`
  * — `prime` MUST be ≥ the plane count `bands·bits`, because any polynomial
  * in `j` taken directly mod 7 is 7-periodic in `j` (only 7 distinct planes;
  * the r2 defect), and a prime BELOW the plane count makes plane(j) ==
  * plane(j + prime) (the r3 defect: 101 < 144 left bands 17–23 re-using
  * bands 0–7's planes). The constructor enforces this fail-loud.
  *
  * Why one expression instead of `bands·bits` separate `vec_dot` calls: the
  * per-plane form evaluates `bands·bits` independent expression trees per
  * row (each re-reading the vector and walking a boxed literal-array
  * operand); this kernel reads the vector once per plane from a primitive
  * `double[][]` baked in as a codegen reference object — same left-fold
  * summation order element-by-element, so the SIGNS (all the bucket uses)
  * are bit-identical to the `vec_dot(e, plane_j)` formulation and to the
  * oracle's per-plane SQL sum.
  */
case class VecLshBuckets(child: Expression, bands: Int, bits: Int,
                         prime: Int, dim: Int) extends UnaryExpression {
  require(prime >= bands * bits,
    s"prime ($prime) must be >= plane count (${bands * bits}): a smaller " +
      "modulus duplicates hyperplanes and silently guts LSH amplification")
  require(bits >= 1 && bits <= 63, s"bits ($bits) must fit a long bucket")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_lsh_buckets"

  @transient private lazy val planes: Array[Array[Double]] =
    VecLshBuckets.planeMatrix(bands * bits, dim, prime)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val p = planes(b * bits + j)
        val n = math.min(p.length, v.numElements())
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * p(i); i += 1 }
        if (s > 0.0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    // freshName for every local — see VecDot.doGenCode for why fixed names
    // break codegen when two instances share a method scope
    val out = ctx.freshName("lshOut")
    val len = ctx.freshName("lshLen")
    val b = ctx.freshName("lshB")
    val bucket = ctx.freshName("lshBucket")
    val j = ctx.freshName("lshJ")
    val p = ctx.freshName("lshP")
    val n = ctx.freshName("lshN")
    val s = ctx.freshName("lshS")
    val i = ctx.freshName("lshI")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |long[] $out = new long[$bands];
         |int $len = $c.numElements();
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double[] $p = $mat[$b * $bits + $j];
         |    int $n = java.lang.Math.min($p.length, $len);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $c.getDouble($i) * $p[$i];
         |    }
         |    if ($s > 0.0) $bucket |= (1L << $j);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): VecLshBuckets =
    copy(child = newChild)
}

object VecLshBuckets {
  /** The shared plane formula — mirrored verbatim in the oracle SQL. */
  def coef(j: Int, i: Int, prime: Int): Double =
    ((i.toLong * 73856093L + j.toLong * 19349663L +
      i.toLong * j * 83492791L) % prime % 7 - 3).toDouble

  def planeMatrix(nPlanes: Int, dim: Int, prime: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((j, i) => coef(j, i, prime))
}

object VectorExprs {
  private val toVec: Expression => Expression = {
    case e if e.dataType == ArrayType(DoubleType, containsNull = false) => e
    case e => Cast(e, ArrayType(DoubleType))
  }

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"vec_lsh_buckets: $name must be an integer literal, got $other")
  }

  /** Inject the vector functions into a session being built. */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(toVec(children.head), toVec(children(1)))))
    ext.injectFunction((
      new FunctionIdentifier("vec_lsh_buckets"),
      new ExpressionInfo(classOf[VecLshBuckets].getName, "vec_lsh_buckets"),
      (children: Seq[Expression]) => VecLshBuckets(toVec(children.head),
        intLit(children(1), "bands"), intLit(children(2), "bits"),
        intLit(children(3), "prime"), intLit(children(4), "dim"))))
  }
}
