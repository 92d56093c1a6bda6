package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Loud fixture guards for the two oracle-side constant table bounds
  * (ADVICE r11, mirroring the quantile sketch's requireExact pattern).
  *
  * The DuckDB oracles for q_bpe_merges and q_text_scrub_passages enumerate
  * positions with constant `range(64)` / `range(512)` tables because
  * DuckDB's range table function refuses lateral column arguments. The
  * WHERE clauses CLIP to those bounds — they do not DETECT violation — so
  * a fixture word of ≥ 64 chars or a doc of > 512 whitespace tokens would
  * make the oracle silently undercount while Spark does not, surfacing as
  * a baffling hash mismatch. These tests fail loudly at the real testdata
  * instead, for every scale factor present on the box.
  *
  *  - BPE bound: symbol sequences start at word-length + 1 entries (the
  *    `</w>` terminator) and only shrink under merges; the tightest oracle
  *    clause is `rr.i < len(t.s)` with i ∈ [0, 63], so len(s0) ≤ 64 ⇔
  *    word length ≤ 63.
  *  - Scrub bound: token positions come from `r.i < len(t)` with
  *    i ∈ [0, 511], so tokens-per-doc ≤ 512.
  */
class OracleBoundsSpec extends SparkSpecBase {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d, "documents.parquet").exists())

  test("at least one driver-generated documents fixture is visible") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf*/documents.parquet found")
  }

  test("BPE oracle bound: max word length <= 63 at every sf") {
    for (d <- sfDirs) {
      val maxLen = graft.Tables.documents(spark, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .agg(max(length(col("w")))).head().getInt(0)
      assert(maxLen <= 63,
        s"$d: max word length $maxLen exceeds the q_bpe_merges oracle's " +
          "range(64) position table — the oracle would silently clip; " +
          "widen the constant table before trusting the hash compare")
    }
  }

  test("scrub oracle bound: max tokens per doc <= 512 at every sf") {
    for (d <- sfDirs) {
      val maxToks = graft.Tables.documents(spark, d)
        .select(size(split(col("text"), " ")).as("n"))
        .agg(max(col("n"))).head().getInt(0)
      assert(maxToks <= 512,
        s"$d: max tokens/doc $maxToks exceeds the q_text_scrub_passages " +
          "oracle's range(512) position table — the oracle would silently " +
          "clip; widen the constant table before trusting the hash compare")
    }
  }
}
