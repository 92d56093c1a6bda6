package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The native codegen vec_dot expression must be bit-identical to the
  * higher-order-function formulation it replaced (same left-fold order). */
class VectorExprsSpec extends SparkSpecBase {

  test("vec_dot == aggregate(zip_with(...)) bit-for-bit on random vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val data = (0 until 200).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = data.toDF("id", "a", "b")
      .withColumn("hof",
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
          (acc, v) => acc + v))
      .withColumn("native", call_function("vec_dot", col("a"), col("b")))
    assert(df.filter(col("hof") =!= col("native")).count() === 0)
  }

  test("vec_dot handles nulls and empty arrays") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (2, None, Some(Seq(1.0))),
      (3, Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("id", "a", "b")
      .withColumn("d", call_function("vec_dot", col("a"), col("b")))
      .orderBy("id").collect()
    assert(df(0).getDouble(3) === 11.0)
    assert(df(1).isNullAt(3))
    assert(df(2).getDouble(3) === 0.0)
  }

  test("vec_dot casts integer arrays implicitly") {
    val got = spark.sql("SELECT vec_dot(array(1, 2, 3), array(2.0, 3.0, 4.0))")
      .collect()(0).getDouble(0)
    assert(got === 20.0)
  }

  test("vec_lsh_buckets == the per-plane vec_dot formulation, sign for sign") {
    val s = spark
    import s.implicits._
    val (bands, bits, prime) = (24, 6, 149)
    val rnd = new scala.util.Random(23)
    val data = (0 until 100).map(i => (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    def planeDot(j: Int) = call_function("vec_dot", col("e"),
      array((0 until 64).map(i => lit(VecLshBuckets.coef(j, i, prime))): _*))
    val perPlane = array((0 until bands).map { b =>
      (0 until bits).map(j =>
        when(planeDot(bits * b + j) > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _)
    }: _*)
    val df = data.toDF("id", "e")
      .withColumn("batched", call_function("vec_lsh_buckets", col("e"),
        lit(bands), lit(bits), lit(prime), lit(64)))
      .withColumn("reference", perPlane)
    assert(df.filter(col("batched") =!= col("reference")).count() === 0)
  }

  test("the 149-prime plane family is pairwise distinct (the r2/r3 defects)") {
    def planeKey(j: Int, prime: Int): Seq[Double] =
      (0 until 64).map(i => VecLshBuckets.coef(j, i, prime))
    val with149 = (0 until 144).map(planeKey(_, 149)).distinct.size
    assert(with149 === 144, s"expected 144 pairwise-distinct planes, got $with149")
    // the r3 defect, kept as a regression witness: prime 101 < 144 planes
    // collapses plane(j) onto plane(j+101)
    val with101 = (0 until 144).map(planeKey(_, 101)).distinct.size
    assert(with101 < 144, "prime 101 should NOT yield 144 distinct planes")
    // and the expression refuses a too-small prime outright
    val err = intercept[Exception] {
      spark.sql("SELECT vec_lsh_buckets(array(1.0), 24, 6, 101, 64)").collect()
    }
    assert(err.getMessage.contains("prime"), err.getMessage)
  }

  test("vec_lsh_buckets null vector yields null, short vector uses its length") {
    val s = spark
    import s.implicits._
    val df = Seq((1, Some(Seq(0.5, -0.5))), (2, None))
      .toDF("id", "e")
      .withColumn("b", call_function("vec_lsh_buckets", col("e"),
        lit(4), lit(3), lit(13), lit(64)))
      .orderBy("id").collect()
    assert(df(0).getAs[Seq[Long]]("b").size === 4)
    assert(df(1).isNullAt(2))
  }

  test("vec_best_cell picks the max-cosine index, first index winning ties") {
    val s = spark
    import s.implicits._
    // centroids: axis-aligned; v = (1, 0) must pick index 0; v = (1, 1) has
    // equal cosine to both axes => tie => index 0; v = (0, 1) picks 1;
    // index 2 duplicates index 1 so (0, 1) must still report the FIRST max
    val cents = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 2.0)))
    val rows = Seq((0, Seq(3.0, 0.0)), (1, Seq(2.0, 2.0)), (2, Seq(0.0, 5.0)))
      .toDF("id", "e")
      .withColumn("cell", call_function("vec_best_cell", col("e"), cents))
      .orderBy("id").collect().map(_.getAs[Long]("cell"))
    assert(rows.toSeq === Seq(0L, 0L, 1L))
    // interpreted path (expression eval outside codegen) agrees
    val expr = graft.functions.VecBestCell(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 0.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
    assert(expr.eval(null) === 0L)
    // a zero-norm vector (NaN cosine everywhere) must keep cell 0, not
    // crash — BigDecimal.valueOf(NaN) throws; Spark's round() passes NaN
    // through, NaN ranks GREATEST (max/desc ordering) and the FIRST NaN
    // wins the -cent_id tie-break, so all-NaN → cell 0
    val zero = Seq((0, Seq(0.0, 0.0))).toDF("id", "e")
      .withColumn("cell", call_function("vec_best_cell", col("e"), cents))
      .head().getAs[Long]("cell")
    assert(zero === 0L)
    // an integer literal matrix is coerced, not ClassCastException'd
    val intMat = Seq((0, Seq(1.0, 0.0))).toDF("id", "e")
      .withColumn("cell", call_function("vec_best_cell", col("e"),
        org.apache.spark.sql.functions.expr("array(array(0, 1), array(1, 0))")))
      .head().getAs[Long]("cell")
    assert(intMat === 1L)
    // a non-foldable centroid operand is refused at construction
    val err = intercept[Exception] {
      Seq((1, Seq(1.0))).toDF("id", "e")
        .withColumn("c", call_function("vec_best_cell", col("e"), col("e")))
        .collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("vec_best_cell ranks a NaN cosine GREATEST — max_by/probesOf semantics " +
    "(r17 ADVICE: zero-norm centroid)") {
    val s = spark
    import s.implicits._
    // centroid 1 is zero-norm → cos = NaN for every vector; Spark's
    // max_by(cent_id, struct(round(cos,6), -cent_id)) sorts NaN above
    // every double, so the ZERO-NORM centroid must win even though
    // centroid 0 matches the vector perfectly. The pre-fix kernel skipped
    // NaN (cos > best = false) and silently picked 0 — diverging from the
    // relational form and from Pq.probesOf's driver-side ranking.
    val cents = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 0.0), Seq(0.0, 1.0)))
    val got = Seq((0, Seq(3.0, 0.0)), (1, Seq(0.0, 5.0)))
      .toDF("id", "e")
      .withColumn("kernel", call_function("vec_best_cell", col("e"), cents))
      .orderBy("id").collect().map(_.getAs[Long]("kernel"))
    // Spark's struct max ranks NaN above every double (and probesOf sorts
    // the same way driver-side), so the zero-norm centroid 1 wins both
    // rows — the pre-fix kernel silently picked the best FINITE cosine.
    // (A relational max_by reference cannot run here: under Spark 4's
    // default ANSI mode the 0/0 cosine THROWS instead of yielding NaN —
    // the kernel's NaN passthrough mirrors the driver-side probesOf math.)
    assert(got.toSeq === Seq(1L, 1L))
  }

  test("vec_l2 ≡ the coordinate-fold Σ(a−b)² bit-for-bit; nulls null out") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val data = (0 until 200).map { i =>
      (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = data.toDF("id", "a", "b")
      .withColumn("hof",
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v))
      .withColumn("native", call_function("vec_l2", col("a"), col("b")))
    assert(df.filter(col("hof") =!= col("native")).count() === 0)
    val nulls = Seq((1, Option(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b")
      .withColumn("d", call_function("vec_l2", col("a"), col("b")))
      .head()
    assert(nulls.isNullAt(3))
  }

  test("vec_pq_codes: argmin round-6 L2 per subspace, smallest centroid id " +
    "winning ties; interpreted and codegen paths agree") {
    val s = spark
    import s.implicits._
    // m=2 subspaces of subDim=2; subspace 0's two centroids are equidistant
    // from (1,1) → tie → code 0; subspace 1 clearly picks centroid 1
    val cb = Seq(
      Seq(Seq(2.0, 0.0), Seq(0.0, 2.0)),   // m=0
      Seq(Seq(9.0, 9.0), Seq(1.0, 1.0)))   // m=1
    val codes = Seq((0, Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("id", "e")
      .withColumn("codes", call_function("vec_pq_codes", col("e"),
        typedLit(cb)))
      .head().getSeq[Long](2)
    assert(codes.toSeq === Seq(0L, 1L))
    // interpreted path (direct eval, no codegen) agrees
    val expr = graft.functions.VecPqCodes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 1.0, 1.0, 1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        cb, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
    val got = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(got.toSeq === Seq(0L, 1L))
  }
}
