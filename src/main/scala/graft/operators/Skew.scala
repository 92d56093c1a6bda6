package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation recipes (SURVEY.md §7 step 7).
  *
  * AQE's skew-join splitting covers joins; hot GROUP BY keys still funnel
  * an entire key's rows through one reducer. [[saltedAgg]] is the classic
  * two-phase rewrite: aggregate on (key, salt) first — spreading one hot
  * key over `buckets` reducers — then combine the partials per key. Valid
  * for any algebraic aggregate (the caller supplies the partial and final
  * expressions; count→sum, sum→sum, min→min, max→max).
  *
  * At 100 TB the first shuffle carries |keys|×buckets partial rows instead
  * of routing the hottest key's entire volume to one task.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partial aggregate expressions for phase 1 (per key+salt), named
    * @param finalAgg aggregate expressions for phase 2 (per key), over the
    *                 phase-1 output columns
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    salted.groupBy(keys :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted equi-join for a skewed probe side: each probe row gets a
    * deterministic salt in [0, buckets); the build side is replicated once
    * per salt value; the join key becomes (key, salt). One hot key's rows
    * spread over `buckets` reducers, at the cost of `buckets`× the (small)
    * build side — the explicit recipe for when the build side is too big to
    * broadcast but cheap to replicate, and the complement of AQE's
    * adaptive skew-join splitting (which needs sort-merge + statistics).
    * Join semantics are unchanged: every (probe, build) key match meets in
    * exactly one salt bucket. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val saltedProbe = probe.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets.toLong)))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
