package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

/** B5 partitioned layout + partition pruning: the {year}/{isbn} folder
  * convention of the reference (MetadataIngestionServiceImpl.java:200–202)
  * maps to `partitionBy("year")` parquet — a year-filtered query must list
  * ONLY that year's directory, which is what makes the layout pay off at
  * 100 TB. */
class PartitionPruneSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  test("year-partitioned write prunes to one partition on a year filter") {
    val s = spark
    val dir = scratch("pruned") + "/orders_by_year"
    Tables.orders(s, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(dir)

    val q = s.read.parquet(dir).filter(col("o_year") === 1997)
      .select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)

    // count files actually scanned: only the o_year=1997 directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.contains(1), s"selected partitions: $scanned")

    val expected = Tables.orders(s, sf)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(q.count() === expected)
  }
}
