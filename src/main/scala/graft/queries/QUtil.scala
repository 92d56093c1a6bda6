package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by the oracle query catalog.
  *
  * The DuckDB oracle hash-compares values, so every double aggregate must be
  * bit-reproducible across engines AND across partition orders. Plain
  * `sum(double)` is order-dependent; instead we exploit that the money-like
  * columns in the testdata carry ≤`scale` decimal places: scale them to
  * integers (exact doubles), sum exactly (|sum| ≪ 2^53), and rescale. The
  * same formula is written verbatim in the oracle SQL.
  */
object QUtil {
  /** Order-independent, engine-exact sum of a fixed-point double column.
    * `digits` = decimal places carried by the expression (2 for prices,
    * 4 for price*(1-disc), 6 for price*(1-disc)*(1+tax)). */
  def moneySum(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    round(sum(round(c * f)) / f, digits)
  }

  /** SQL mirror of [[moneySum]] for the DuckDB side. */
  def moneySumSql(e: String, digits: Int): String = {
    val f = s"1e$digits"
    s"round(sum(round(($e) * $f)) / $f, $digits)"
  }

  /** Deterministic average: exact integer-scaled sum / exact count. */
  def moneyAvg(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    round(sum(round(c * f)) / f / count(lit(1)), 6)
  }

  def moneyAvgSql(e: String, digits: Int): String = {
    val f = s"1e$digits"
    s"round(sum(round(($e) * $f)) / $f / count(*), 6)"
  }
}
