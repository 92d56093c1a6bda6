package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/** SURVEY.md §5.2-3: window/agg algebraic laws on generated data — the
  * properties partial aggregation and deterministic dedup rely on. */
class AlgebraSpec extends SparkSpecBase {

  private val rowGen: Gen[(Int, Double)] = for {
    k <- Gen.choose(0, 5)
    cents <- Gen.choose(-100000L, 100000L)
  } yield (k, cents / 100.0)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("moneySum distributes over union (the partial-aggregation law)") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) { (a, b) =>
      def total(rows: List[(Int, Double)]): Option[Double] =
        if (rows.isEmpty) Some(0.0)
        else Option(rows.toDF("k", "v").agg(QUtil.moneySum(col("v"), 2)).collect()(0))
          .map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0))
      (total(a), total(b), total(a ++ b)) match {
        case (Some(x), Some(y), Some(xy)) => math.abs((x + y) - xy) < 1e-9
        case _ => false
      }
    })
  }

  test("groupBy over union == merging the two groupBys (map-side combine law)") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.listOf(rowGen), Gen.listOf(rowGen)) { (a, b) =>
      val direct = (a ++ b).groupBy(_._1).map { case (k, rs) =>
        (k, rs.size.toLong, math.round(rs.map(_._2 * 100).map(math.round(_).toDouble).sum))
      }.toSet
      val viaDf = (a ++ b) match {
        case Nil => Set.empty[(Int, Long, Long)]
        case all => all.toDF("k", "v")
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(round(col("v") * 100)).as("cents"))
          .collect().map(r => (r.getInt(0), r.getLong(1), math.round(r.getDouble(2)))).toSet
      }
      direct == viaDf
    })
  }

  test("deterministic dedup is idempotent and keeps exactly one row per key") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.toDF("k", "v")
      val w = Window.partitionBy(col("k")).orderBy(col("v"), monotonically_increasing_id())
      def dedup(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      val once = dedup(df).collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
      val twice = dedup(dedup(df)).collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
      val keys = rows.map(_._1).distinct.sorted
      once == twice && once.map(_._1) == keys &&
        // survivor is the minimum value per key (the explicit order)
        once.forall { case (k, v) => v == rows.filter(_._1 == k).map(_._2).min }
    })
  }

  test("ranking window emits a 1..n permutation inside every partition") {
    val s = spark
    import s.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val w = Window.partitionBy(col("k")).orderBy(col("v"), monotonically_increasing_id())
      val rns = rows.toDF("k", "v").withColumn("rn", row_number().over(w))
        .collect().map(r => (r.getInt(0), r.getInt(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      rows.groupBy(_._1).forall { case (k, rs) => rns(k) == (1 to rs.size) }
    })
  }
}
