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
}
