package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** graft.operators.OrderedCumsum (SURVEY.md §2 B83): the two-pass
  * range/offset running total must equal the single-partition window
  * row-for-row, stay invariant to the partition count, and actually avoid
  * the SinglePartition exchange it exists to remove. */
class OrderedCumsumSpec extends SparkSpecBase {

  private def data = {
    val s = spark
    import s.implicits._
    // duplicate values force the tiebreaker; values span partitions
    (1 to 500).map(i => (i.toLong, ((i * 7) % 40 + 1).toLong))
      .toDF("id", "v")
  }

  private def reference = {
    val w = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    data.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("v"), col("cum"))
  }

  test("equals the single-partition window row-for-row") {
    val got = OrderedCumsum.withRunningTotal(data,
      Seq(col("v").desc, col("id")), col("v"), "cum", partitions = 7)
      .select(col("id"), col("v"), col("cum"))
    assert(got.except(reference).isEmpty && reference.except(got).isEmpty)
  }

  test("invariant to the range partition count (1, 3, 16)") {
    val forms = Seq(1, 3, 16).map(p =>
      OrderedCumsum.withRunningTotal(data,
        Seq(col("v").desc, col("id")), col("v"), "cum", partitions = p)
        .select(col("id"), col("cum")))
    forms.sliding(2).foreach { case Seq(a, b) =>
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
    }
  }

  test("no SinglePartition exchange feeds the running-total window") {
    val plan = OrderedCumsum.withRunningTotal(data,
      Seq(col("v").desc, col("id")), col("v"), "cum", partitions = 7)
      .queryExecution.executedPlan.toString
    // the window is keyed by __pid (hash exchange over the range pass);
    // a SinglePartition exchange anywhere would mean the operator
    // reintroduced the bottleneck it replaces
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange in the plan:\n$plan")
    assert(plan.contains("rangepartitioning"),
      "the range exchange is missing — ordering is not global")
  }
}
