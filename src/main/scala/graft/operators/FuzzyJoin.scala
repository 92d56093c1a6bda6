package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-blocked edit-distance similarity self-join (SURVEY.md §2 B111) —
  * the Ed-Join / PASS-JOIN family (Xiao et al. VLDB 2008; Li, Deng & Feng
  * VLDB 2011): record-linkage's "find all pairs within edit distance d"
  * WITHOUT the all-pairs levenshtein scan.
  *
  * Blocking rule (positional segments): each string is cut into
  * `maxDist + 1` contiguous segments at integer-division boundaries
  * (start_i = i·len div nSeg — a pure function of the length, identical in
  * any engine). Candidates = pairs sharing (segment ordinal, segment text,
  * string length); survivors are CONFIRMED with full `levenshtein ≤ maxDist`.
  *
  * Completeness guarantee (the pigeonhole theorem, pinned in
  * FuzzyJoinSpec): two EQUAL-LENGTH strings differing by ≤ maxDist
  * SUBSTITUTIONS cannot touch all maxDist+1 segments, so at least one
  * segment matches positionally and the pair is admitted. Pairs reachable
  * only through INDELS (shifted text) can be missed by positional
  * segments — PASS-JOIN's shifted-probe extension (probe each segment at
  * ±maxDist offsets) closes that at (2·maxDist+1)× the candidate cost;
  * the spec demonstrates the limitation explicitly rather than hiding it.
  *
  * Scale shape: one typed flatMap emits maxDist+1 segment rows per string
  * in the scan stage; ONE equi-join on the (ordinal, text, length) block
  * key (never a cartesian, never a theta-join); `maxBlock` refuses
  * degenerate blocks (a segment shared by half the corpus — boilerplate
  * prefixes — would re-create the quadratic this operator exists to
  * avoid), the same skew-refusal convention every LSH/blocking shape in
  * this catalog enforces and mirrors in its oracle's HAVING; the confirm
  * is one codegen'd `levenshtein` per CANDIDATE, not per pair of the
  * corpus.
  *
  * @param keyed    (id: Long, s: String)
  * @param maxDist  inclusive levenshtein threshold (≥ 1)
  * @param maxBlock refuse blocks with more members than this */
object FuzzyJoin {

  def selfJoin(keyed: DataFrame, maxDist: Int,
               maxBlock: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1, s"maxDist ($maxDist) must be >= 1")
    require(maxBlock >= 2, s"maxBlock ($maxBlock) must admit pairs")
    val spark = keyed.sparkSession
    import spark.implicits._
    val nSeg = maxDist + 1
    val segs = keyed.select(col("id"), col("s")).as[(Long, String)]
      .flatMap { case (id, s) =>
        // CODE-POINT segmentation (not UTF-16 units): the block key and the
        // DuckDB oracle both use SQL length/substr semantics, which count
        // code points — segmenting by s.length would split surrogate pairs
        // on non-BMP input and diverge from the oracle.
        val len = s.codePointCount(0, s.length)
        (0 until nSeg).iterator.map { i =>
          val from = s.offsetByCodePoints(0, i * len / nSeg)
          val until = s.offsetByCodePoints(0, (i + 1) * len / nSeg)
          (id, s, len, i, s.substring(from, until))
        }
      }.toDF("id", "s", "len", "seg_i", "seg")
    val ok = segs.groupBy(col("seg_i"), col("seg"), col("len"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBlock)
      .select(col("seg_i"), col("seg"), col("len"))
    val blocked = segs.join(ok, Seq("seg_i", "seg", "len"), "left_semi")
    val cand = blocked.select(col("id").as("id_a"), col("s").as("sa"),
        col("seg_i"), col("seg"), col("len"))
      .join(blocked.select(col("id").as("id_b"), col("s").as("sb"),
        col("seg_i"), col("seg"), col("len")),
        Seq("seg_i", "seg", "len"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
      .distinct()
    cand.withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
