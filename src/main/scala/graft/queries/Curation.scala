package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity (SURVEY.md §2 Part B extensions): repetition
  * quality gates, PII redaction, incremental SCD2 snapshot merge,
  * embedding pooling and an inverted term index.
  *
  * Scale posture: every query is a linear scan plus key-partitioned
  * aggregates/windows — no all-pairs step, no driver-side loop. The
  * repetition metrics ride ONE posexplode (the bigram and run passes share
  * it); the SCD2 merge is the one key shuffle an incremental ingest pays;
  * pooling aggregates (label, dim) with map-side partial combine.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic PII appended to each doc — the corpus itself is
    * PII-free word soup, so the redaction path needs planted addresses. The
    * SAME expression is written in the oracle SQL: the redaction is what is
    * under test, not the planting. */
  private def withPii(docs: DataFrame): DataFrame =
    docs.withColumn("text2", concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      when(col("doc_id") % 7 === 0, lit(" and admin@test.org")).otherwise(lit(""))))

  /** Regexes kept to the Java-regex ∩ RE2 common subset (char classes,
    * +/{n} quantifiers — no lookaround, no backrefs) so Spark and DuckDB
    * match identically. */
  private val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
  private val PhoneRe = "555-[0-9]{4}"

  val defs: Map[String, Q] = Map(
    // Gopher-style repetition metrics: duplicate-token fraction, most
    // frequent bigram share, longest same-token run. One posexplode feeds
    // both the bigram counts and the run-length pass; everything downstream
    // is (doc_id)-partitioned — at 100 TB this shuffles token rows once on
    // doc_id and aggregates with partial combine.
    "q_text_repetition" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val seq = toks
        .withColumn("next_tok", lead(col("tok"), 1).over(w))
        .withColumn("new_run",
          when(lag(col("tok"), 1).over(w) === col("tok"), 0).otherwise(1))
        .withColumn("run_id", sum(col("new_run"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val runs = seq.groupBy(col("doc_id"), col("run_id"))
        .agg(count(lit(1)).as("rl"))
        .groupBy(col("doc_id")).agg(max(col("rl")).as("max_run"))
      val bg = seq.filter(col("next_tok").isNotNull)
        .groupBy(col("doc_id"), col("tok"), col("next_tok"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("top_bigram_n"), sum(col("n")).as("n_bigrams"))
      docs.select(col("doc_id"),
          size(split(col("text"), " ")).as("n_toks"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct"))
        .join(bg, Seq("doc_id"), "left")
        .join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          round(lit(1.0) - col("n_distinct") / col("n_toks").cast("double"), 6)
            .as("dup_tok_frac"),
          col("top_bigram_n"),
          round(col("top_bigram_n") / col("n_bigrams").cast("double"), 6)
            .as("top_bigram_frac"),
          col("max_run"))
        .orderBy(col("doc_id"))
    },

    // PII redaction: emails/phones matched, counted, and replaced in one
    // linear codegen'd pass (regexp_extract_all + regexp_replace — no UDF).
    // Output carries the md5 of the redacted text so the oracle proves the
    // rewritten BYTES match, not just the counts.
    "q_text_pii" -> { (s, d) =>
      withPii(Tables.documents(s, d)).select(col("doc_id"),
          size(regexp_extract_all(col("text2"), lit(EmailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text2"), lit(PhoneRe), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace(col("text2"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },

    // Inverted term index: term → document frequency + first-20 posting
    // list. distinct (doc, term) pairs → one aggregate on term; the posting
    // list is slice-capped so a mega-term (every term here, 31-token vocab)
    // carries bounded state — the cap rule every collect_list at scale needs.
    "q_text_inverted" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", transform(
            slice(sort_array(collect_list(col("doc_id"))), 1, 20),
            k => k.cast("string"))).as("postings"))
        .orderBy(col("term"))
    },

    // B128 positional PHRASE search — the retrieval operation the B54
    // doc-level inverted index cannot answer: "these words ADJACENT, in
    // order". Postings carry POSITIONS (term, doc_id, pos — the Lucene
    // proximity-query layout); a phrase match is one broadcast join of
    // the phrase table onto the postings plus ONE positional self-join
    // (pos₂ = pos₁ + 1, all-equi → hash join), never a regex rescan of
    // the corpus. Cost scales with posting-list sizes of the phrase's
    // terms, not corpus bytes; longer phrases chain one join per gap.
    // Phrases probed non-vacuous at both SFs (29–34 / 289–290 docs).
    "q_text_phrase" -> { (s, d) =>
      import s.implicits._
      val post = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      val ph = Seq(("table value", "table", "value"),
        ("key agg", "key", "agg")).toDF("phrase", "w1", "w2")
      post.join(broadcast(ph), col("term") === col("w1"))
        .select(col("phrase"), col("w2"), col("doc_id"),
          (col("pos") + 1).as("pos2"))
        .join(post.select(col("doc_id"), col("pos").as("pos2"),
          col("term").as("t2")), Seq("doc_id", "pos2"))
        .filter(col("t2") === col("w2"))
        .groupBy(col("phrase"), col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .orderBy(col("phrase"), col("doc_id"))
    },

    // Embedding mean-pool per label class: posexplode dims → (label, dim)
    // aggregate with map-side combine. Float sums are order-dependent, so
    // the mean rides the integer-scaled exact-sum trick (QUtil doc): round
    // each float to 6 dp as an integer, sum exactly. The mean itself is
    // floor(sum_micro / n) — an exact integer in micro units. round() on
    // the quotient is NOT safe: when sum_micro/n lands on a half-integer
    // (any n divisible by 128, e.g. 192 groups at sf0.1), Spark rounds the
    // shortest decimal repr HALF_UP while DuckDB rounds the raw double,
    // and the tie splits — found by the sf0.1 differential run.
    "q_embed_pool" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(floor(sum(round(col("v").cast("double") * 1e6)) / count(lit(1)))
            .cast("long").as("pooled_micro"),
          count(lit(1)).as("n"))
        .orderBy(col("label"), col("dim"))
    },

    // SCD2 incremental merge: base snapshot (orders with key%100 < 90) +
    // change batch (key%10 = 3: updates where the key exists, inserts at
    // %100 = 93) → versioned rows with is_current. The merge is two
    // key-partitioned joins (existence flags), ONE shuffle each — the
    // canonical MERGE INTO dataflow without a table format, and exactly
    // what an incremental 100 TB ingest pays per batch. Prices are carried
    // as integer cents (round to 0 dp agrees across engines; round(x, 2)
    // does NOT — Spark rounds the shortest decimal repr, DuckDB the raw
    // double, and .xx5 ties split).
    "q_scd2_merge" -> { (s, d) =>
      val orders = Tables.orders(s, d)
      val base = orders.filter(col("o_orderkey") % 100 < 90)
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          col("o_orderstatus").as("status"))
      val changes = orders.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 110).cast("long").as("price_cents"),
          lit("U").as("status"))
      val v1 = base.join(changes.select(col("k"), lit(1).as("upd")), Seq("k"), "left")
        .select(col("k"), col("price_cents"), col("status"), lit(1).as("version"),
          col("upd").isNull.as("is_current"))
      val v2 = changes.join(base.select(col("k"), lit(1).as("had")), Seq("k"), "left")
        .select(col("k"), col("price_cents"), col("status"),
          when(col("had").isNotNull, 2).otherwise(1).as("version"),
          lit(true).as("is_current"))
      v1.unionByName(v2).orderBy(col("k"), col("version"))
    },

    // SCD2 point-in-time lookup: reconstruct the snapshot AS OF version 1
    // from the versioned rows q_scd2_merge produces — for each key, the
    // highest version ≤ the asked-for version wins (one max_by aggregate,
    // map-side combined). The read half of the SCD2 story: a time-travel
    // query without a table format.
    "q_scd2_asof" -> { (s, d) =>
      val orders = Tables.orders(s, d)
      val base = orders.filter(col("o_orderkey") % 100 < 90)
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          col("o_orderstatus").as("status"), lit(1).as("version"))
      val changes = orders.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 110).cast("long").as("price_cents"),
          lit("U").as("status"))
        .join(base.select(col("k"), lit(1).as("had")), Seq("k"), "left")
        .select(col("k"), col("price_cents"), col("status"),
          when(col("had").isNotNull, 2).otherwise(1).as("version"))
      // AS OF version 1: batch-1 inserts (version 1, including new keys
      // from the change batch) visible, version-2 updates not yet applied
      base.unionByName(changes)
        .filter(col("version") <= 1)
        .groupBy(col("k"))
        .agg(max_by(struct(col("price_cents"), col("status")), col("version"))
          .as("v"))
        .select(col("k"), col("v.price_cents").as("price_cents"),
          col("v.status").as("status"))
        .orderBy(col("k"))
    },

    // Incremental aggregate maintenance: the base partition's aggregate
    // state (count + exact integer-cents sum) merged with a delta
    // partition's state must equal the full-table aggregate — the
    // materialized-view refresh pattern. At 100 TB this is THE economics of
    // a daily ingest: re-aggregate only the new partition and merge states
    // (sums of sums, sums of counts), never rescan history. The oracle IS
    // the full-table aggregate, so the row proves merged-incremental ≡
    // recomputed-from-scratch.
    "q_incr_agg" -> { (s, d) =>
      val orders = Tables.orders(s, d)
      def state(pred: Column): DataFrame = orders.filter(pred)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val base  = state(col("o_orderkey") % 100 < 90)
      val delta = state(col("o_orderkey") % 100 >= 90)
      base.unionByName(delta)
        .groupBy(col("status"))
        .agg(sum(col("cnt")).as("cnt"), sum(col("cents")).as("cents"))
        .orderBy(col("status"))
    },

    // CDC apply: an insert/update/delete changelog (ordered by a sequence
    // number) reduced to the latest-wins snapshot. One aggregate with
    // max_by(struct, seq) — partial combine on the map side, ONE shuffle on
    // the key — rather than the window row_number() form, which would sort
    // every key group just to keep row 1. Deletes survive to the aggregate
    // (a late D must beat an early U) and drop afterwards.
    "q_cdc_apply" -> { (s, d) =>
      val orders = Tables.orders(s, d)
      val ins = orders.select(col("o_orderkey").as("k"), lit(1L).as("seq"),
        lit("I").as("op"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      val upd = orders.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey").as("k"), lit(2L).as("seq"), lit("U").as("op"),
          round(col("o_totalprice") * 110).cast("long").as("price_cents"))
      val del = orders.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), lit(3L).as("seq"), lit("D").as("op"),
          lit(null).cast("long").as("price_cents"))
      ins.unionByName(upd).unionByName(del)
        .groupBy(col("k"))
        .agg(max_by(struct(col("op"), col("price_cents")), col("seq")).as("last"))
        .filter(col("last.op") =!= "D")
        .select(col("k"), col("last.op").as("op"),
          col("last.price_cents").as("price_cents"))
        .orderBy(col("k"))
    },

    // Equal-width histogram (profiler family): 20 integer-cents bins over
    // o_totalprice, bin = (cents − min)·20 div (max − min + 1) — exact
    // integer arithmetic end to end (a double-width bin formula would tie-
    // break differently across engines at bin edges). Two passes: one
    // min/max aggregate (broadcast as a 1-row cross join), one binning
    // aggregate — the standard profiler dataflow at any scale.
    "q_histogram" -> { (s, d) =>
      val cents = round(col("o_totalprice") * 100).cast("long")
      val stats = Tables.orders(s, d)
        .agg(min(cents).as("lo"), max(cents).as("hi"))
      Tables.orders(s, d)
        .select(cents.as("c")).crossJoin(broadcast(stats))
        .select(floor((col("c") - col("lo")) * 20 /
          (col("hi") - col("lo") + 1).cast("double")).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    },

    // B69 corpus card: the per-(source, lang) datasheet every corpus
    // release ships — doc/char/token totals, exact-duplicate rate, mean
    // and exact-median doc length. One pass computes the per-doc facts
    // (sha copy-count via a window on the content hash — the one shuffle
    // exact dup-rate costs); the median is a discrete order statistic
    // from the per-group length HISTOGRAM (cumulative window over
    // distinct lengths only — never the corpus; the q_text_length_clip
    // convention), so no float percentile and no per-group sort of docs
    // exists anywhere. All ratios are integer (ppm / integer division).
    "q_corpus_card" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          sha2(col("text"), 256).as("sha"))
      val b = docs.withColumn("n_sha",
        count(lit(1)).over(Window.partitionBy(col("sha"))))
      val stats = b.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_toks")).as("total_toks"),
          sum(when(col("n_sha") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
      val h = docs.groupBy(col("source"), col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
      val cw = Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = h.withColumn("cum", sum(col("c")).over(cw))
        .join(h.groupBy(col("source"), col("lang")).agg(sum(col("c")).as("n")),
          Seq("source", "lang"))
        .groupBy(col("source"), col("lang"))
        .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("n_chars")))
          .as("p50_chars"))
      stats.join(med, Seq("source", "lang"))
        .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
          col("total_toks"), expr("total_toks div n_docs").as("mean_toks"),
          col("p50_chars"),
          floor(col("n_exact_dup") * 1000000 / col("n_docs").cast("double"))
            .cast("long").as("dup_ppm"))
        .orderBy(col("source"), col("lang"))
    },

    // Column profiler: per-column null count, exact distinct count and
    // min/max over a dynamic column list, in ONE pass (the aggregate row is
    // melted to one output row per column). Multiple exact count(distinct)
    // expand the input k-ways — at 100 TB swap count_distinct for
    // approx_count_distinct (same shape, no expand); exact here because the
    // oracle hash-compares. Restricted to integer/string columns: double
    // min/max would compare Java vs C++ float formatting, not data.
    "q_profile" -> { (s, d) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"${c}__nn"),
          count_distinct(col(c)).as(s"${c}__nd"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"))
      } :+ count(lit(1)).as("__total")
      Tables.orders(s, d).agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          (col("__total") - col(s"${c}__nn")).as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_s"),
          col(s"${c}__max").as("max_s"))): _*)).as("p"))
        .select(col("p.*"))
        .orderBy(col("col_name"))
    },

    // B70 SCD2 version expiry (the VACUUM/retention-planning dataflow):
    // given a versioned history (four change batches over orders — see
    // scdVersions), purge every version already superseded before the
    // retention cutoff, i.e. whose validity window [version, next_version)
    // ends at or before the cutoff — while provably keeping everything an
    // AS OF read at any version >= cutoff needs (plus all current rows,
    // which have no next_version). One lead() window over (key, version)
    // decides each row's fate — ONE shuffle on the key at any scale, the
    // same shape a table format's VACUUM planner pays. The emitted rows
    // are the purge manifest (what a maintenance job would delete) — the
    // auditable artifact of the operation; ScdExpirySpec proves the
    // safety property (AS OF >= cutoff unchanged by the purge) and its
    // tightness (AS OF cutoff-1 IS changed — nothing extra is retained).
    "q_scd2_expire" -> { (s, d) =>
      val w = Window.partitionBy(col("k")).orderBy(col("version"))
      scdVersions(s, d)
        .withColumn("next_version", lead(col("version"), 1).over(w))
        .filter(col("next_version") <= ScdExpireCutoff)
        .select(col("k"), col("version"), col("next_version"), col("price_cents"))
        .orderBy(col("k"), col("version"))
    },

    // B78 incremental corpus card: the q_corpus_card datasheet maintained
    // the way a daily 100 TB ingest actually maintains it — per-partition
    // PARTIAL states (per-(source, lang) count/char/token sums plus the
    // per-(source, lang, n_chars) length histogram) computed on a base and
    // a delta slice separately, then MERGED (sums of sums, histogram =
    // sum of histograms) and finished into the card. The oracle is the
    // full-corpus computation, so the row proves merged-incremental ≡
    // recomputed-from-scratch (the q_incr_agg economics, extended to an
    // order statistic: the median survives merging because the HISTOGRAM
    // is the mergeable state, not the quantile). The exact-dup rate is
    // deliberately absent — it needs the B49 sha index (q_dedup_bloom_gate
    // maintains that incrementally); a mergeable sha-level state would
    // just BE that index.
    "q_incr_card" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          col("doc_id"))
      // partial states per slice: (source, lang, n_chars) -> (c, toks)
      def state(pred: Column): DataFrame = docs.filter(pred)
        .groupBy(col("source"), col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("c"), sum(col("n_toks")).as("toks"))
      val merged = state(col("doc_id") % 10 < 9)   // base: 90%
        .unionByName(state(col("doc_id") % 10 === 9)) // delta: 10%
        .groupBy(col("source"), col("lang"), col("n_chars"))
        .agg(sum(col("c")).as("c"), sum(col("toks")).as("toks"))
      val stats = merged.groupBy(col("source"), col("lang"))
        .agg(sum(col("c")).as("n_docs"),
          sum(col("n_chars") * col("c")).as("total_chars"),
          sum(col("toks")).as("total_toks"))
      val cw = Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = merged.withColumn("cum", sum(col("c")).over(cw))
        .join(stats.select(col("source"), col("lang"), col("n_docs").as("n")),
          Seq("source", "lang"))
        .groupBy(col("source"), col("lang"))
        .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("n_chars")))
          .as("p50_chars"))
      stats.join(med, Seq("source", "lang"))
        .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
          col("total_toks"), expr("total_toks div n_docs").as("mean_toks"),
          col("p50_chars"))
        .orderBy(col("source"), col("lang"))
    },

    // B76 declarative data-quality expectations (the dbt-test / Deequ
    // dataflow): a rule set evaluated in ONE scan — every row rule is a
    // conditional sum in a single aggregate (plus the uniqueness rule's
    // count-distinct), melted to one audit row per rule (the q_profile
    // convention). At 100 TB this is the shape that matters: N rules cost
    // one pass, not N passes; swap count_distinct for
    // approx_count_distinct when exactness of THAT rule can relax. Two
    // rules are deliberately violated by the fixture (price cap, date
    // range) so the report proves detection, not just green checkmarks.
    "q_expectations" -> { (s, d) =>
      val agg = Tables.orders(s, d).agg(
        count(lit(1)).as("total"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v_notnull"),
        (count(col("o_orderkey")) - count_distinct(col("o_orderkey")))
          .as("v_unique"),
        sum(when(to_date(col("o_orderdate")) >= lit("2000-01-01").cast("date"),
          1L).otherwise(0L)).as("v_date"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("v_domain"),
        sum(when(col("o_totalprice") > 400000, 1L).otherwise(0L)).as("v_cap"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v_pos"))
      val rules = Seq(
        ("o_orderdate_before_2000", "v_date"),
        ("o_orderkey_not_null", "v_notnull"),
        ("o_orderkey_unique", "v_unique"),
        ("o_orderstatus_domain", "v_domain"),
        ("o_totalprice_le_400k", "v_cap"),
        ("o_totalprice_positive", "v_pos"))
      agg.select(explode(array(rules.map { case (n, c) => struct(
          lit(n).as("rule"), col(c).as("n_violations"),
          col("total").as("n_rows")) }: _*)).as("r"))
        .select(col("r.*"))
        .withColumn("violation_ppm",
          floor(col("n_violations") * 1000000 / col("n_rows").cast("double"))
            .cast("long"))
        .withColumn("pass", col("n_violations") === 0L)
        .orderBy(col("rule"))
    },

    // B77 referential-integrity audit: orphan counts per FK edge, each
    // edge ONE key-shuffled left join + conditional-sum aggregate (the
    // parent side is PK-unique, so the join never multiplies; at 100 TB a
    // bloom prefilter on the parent keyset — the B58 q_bloom_join shape —
    // cuts the child shuffle to probable-orphan rows). One parent table is
    // deliberately "damaged" (orders with key % 97 = 0 removed) so the
    // audit proves nonzero orphan detection next to the two healthy edges.
    "q_fk_audit" -> { (s, d) =>
      def leg(name: String, child: DataFrame, ckey: String,
              parent: DataFrame, pkey: String): DataFrame =
        child.select(col(ckey).as("k"))
          .join(parent.select(col(pkey).as("k"), lit(1).as("hit")),
            Seq("k"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
            floor(col("n_orphans") * 1000000 / col("n_child").cast("double"))
              .cast("long").as("orphan_ppm"))
      val li = Tables.lineitem(s, d)
      leg("fk_lineitem_orderkey_pruned", li, "l_orderkey",
          Tables.orders(s, d).filter(col("o_orderkey") % 97 =!= 0), "o_orderkey")
        .unionByName(leg("fk_lineitem_partkey", li, "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionByName(leg("fk_orders_custkey", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy(col("fk"))
    })

  /** Retention cutoff for q_scd2_expire: versions superseded before
    * version 3 are purgeable; AS OF 3 and AS OF 4 reads must survive. */
  private[graft] val ScdExpireCutoff = 3

  /** Deterministic 4-batch versioned history over orders (the deeper SCD2
    * fixture q_scd2_expire and ScdExpirySpec share): v1 inserts every key;
    * v2/v3/v4 update overlapping key slices (k%10=3, k%4=1, k%6=3), so keys
    * carry 1–4 versions and every purge/keep case exists. The SAME
    * construction is written in the oracle SQL — the expiry window is what
    * is under test, not the fixture. */
  private[graft] def scdVersions(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    def batch(pred: Column, pctFactor: Int, version: Int): DataFrame =
      orders.filter(pred)
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * pctFactor).cast("long").as("price_cents"),
          lit(version).as("version"))
    batch(lit(true), 100, 1)
      .unionByName(batch(col("o_orderkey") % 10 === 3, 110, 2))
      .unionByName(batch(col("o_orderkey") % 4 === 1, 120, 3))
      .unionByName(batch(col("o_orderkey") % 6 === 3, 130, 4))
  }

  val oracle: Map[String, String] = Map(
    "q_incr_card" ->
      """WITH d AS (
        |  SELECT source, lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |st AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(n_toks) AS BIGINT) AS total_toks
        |  FROM d GROUP BY source, lang),
        |h AS (SELECT source, lang, n_chars, count(*) AS c
        |  FROM d GROUP BY source, lang, n_chars),
        |cum AS (SELECT source, lang, n_chars,
        |  sum(c) OVER (PARTITION BY source, lang ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
        |med AS (
        |  SELECT cum.source, cum.lang,
        |    min(CASE WHEN cum >= (st.n_docs + 1) // 2 THEN n_chars END) AS p50_chars
        |  FROM cum JOIN st ON st.source = cum.source AND st.lang = cum.lang
        |  GROUP BY cum.source, cum.lang)
        |SELECT st.source, st.lang, st.n_docs, st.total_chars, st.total_toks,
        |  st.total_toks // st.n_docs AS mean_toks, med.p50_chars
        |FROM st JOIN med ON med.source = st.source AND med.lang = st.lang
        |ORDER BY st.source, st.lang""".stripMargin,

    "q_expectations" ->
      """WITH t AS (SELECT count(*) AS total,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_notnull,
        |  CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS v_unique,
        |  CAST(sum(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '2000-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS v_date,
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
        |  CAST(sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT) AS v_cap,
        |  CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_pos
        |  FROM orders),
        |r AS (
        |  SELECT 'o_orderdate_before_2000' AS rule, v_date AS n_violations, total AS n_rows FROM t
        |  UNION ALL SELECT 'o_orderkey_not_null', v_notnull, total FROM t
        |  UNION ALL SELECT 'o_orderkey_unique', v_unique, total FROM t
        |  UNION ALL SELECT 'o_orderstatus_domain', v_domain, total FROM t
        |  UNION ALL SELECT 'o_totalprice_le_400k', v_cap, total FROM t
        |  UNION ALL SELECT 'o_totalprice_positive', v_pos, total FROM t)
        |SELECT rule, n_violations, n_rows,
        |  CAST(floor(n_violations * 1000000 / CAST(n_rows AS DOUBLE)) AS BIGINT) AS violation_ppm,
        |  n_violations = 0 AS pass
        |FROM r ORDER BY rule""".stripMargin,

    "q_fk_audit" ->
      """WITH l1 AS (
        |  SELECT count(*) AS n_child,
        |    CAST(sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |  FROM lineitem li LEFT JOIN
        |    (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 <> 0) o
        |    ON li.l_orderkey = o.k),
        |l2 AS (
        |  SELECT count(*) AS n_child,
        |    CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |  FROM lineitem li LEFT JOIN part p ON li.l_partkey = p.p_partkey),
        |l3 AS (
        |  SELECT count(*) AS n_child,
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |r AS (
        |  SELECT 'fk_lineitem_orderkey_pruned' AS fk, n_child, n_orphans FROM l1
        |  UNION ALL SELECT 'fk_lineitem_partkey', n_child, n_orphans FROM l2
        |  UNION ALL SELECT 'fk_orders_custkey', n_child, n_orphans FROM l3)
        |SELECT fk, n_child, n_orphans,
        |  CAST(floor(n_orphans * 1000000 / CAST(n_child AS DOUBLE)) AS BIGINT) AS orphan_ppm
        |FROM r ORDER BY fk""".stripMargin,

    "q_scd2_expire" ->
      """WITH v AS (
        |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, 1 AS version FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, CAST(round(o_totalprice * 110) AS BIGINT), 2 FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey, CAST(round(o_totalprice * 120) AS BIGINT), 3 FROM orders WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderkey, CAST(round(o_totalprice * 130) AS BIGINT), 4 FROM orders WHERE o_orderkey % 6 = 3),
        |led AS (
        |  SELECT k, version, price_cents,
        |    lead(version) OVER (PARTITION BY k ORDER BY version) AS next_version
        |  FROM v)
        |SELECT k, version, next_version, price_cents
        |FROM led WHERE next_version <= 3
        |ORDER BY k, version""".stripMargin,

    "q_corpus_card" ->
      """WITH d AS (
        |  SELECT source, lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    sha256(text) AS sha
        |  FROM documents),
        |b AS (SELECT *, count(*) OVER (PARTITION BY sha) AS n_sha FROM d),
        |st AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(n_toks) AS BIGINT) AS total_toks,
        |    CAST(sum(CASE WHEN n_sha > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup
        |  FROM b GROUP BY 1, 2),
        |h AS (SELECT source, lang, n_chars, count(*) AS c FROM d GROUP BY 1, 2, 3),
        |cum AS (SELECT source, lang, n_chars, c,
        |  sum(c) OVER (PARTITION BY source, lang ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT source, lang, sum(c)::BIGINT AS n FROM h GROUP BY 1, 2),
        |med AS (
        |  SELECT cum.source, cum.lang,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN n_chars END) AS p50_chars
        |  FROM cum JOIN tot ON tot.source = cum.source AND tot.lang = cum.lang
        |  GROUP BY 1, 2)
        |SELECT st.source, st.lang, st.n_docs, st.total_chars, st.total_toks,
        |  st.total_toks // st.n_docs AS mean_toks, med.p50_chars,
        |  CAST(floor(st.n_exact_dup * 1000000
        |    / CAST(st.n_docs AS DOUBLE)) AS BIGINT) AS dup_ppm
        |FROM st JOIN med ON med.source = st.source AND med.lang = st.lang
        |ORDER BY st.source, st.lang""".stripMargin,

    "q_text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |seq AS (
        |  SELECT doc_id, tok, pos,
        |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS next_tok,
        |    CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) = tok
        |      THEN 0 ELSE 1 END AS new_run
        |  FROM tok),
        |runs AS (
        |  SELECT doc_id, CAST(max(rl) AS BIGINT) AS max_run FROM (
        |    SELECT doc_id, run_id, count(*) AS rl FROM (
        |      SELECT doc_id, sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |      FROM seq) GROUP BY doc_id, run_id) GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, CAST(max(n) AS BIGINT) AS top_bigram_n,
        |    CAST(sum(n) AS BIGINT) AS n_bigrams FROM (
        |    SELECT doc_id, tok, next_tok, count(*) AS n FROM seq
        |    WHERE next_tok IS NOT NULL GROUP BY doc_id, tok, next_tok)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, CAST(len(string_split(b.text, ' ')) AS INT) AS n_toks,
        |  round(1.0 - len(list_distinct(string_split(b.text, ' ')))
        |    / CAST(len(string_split(b.text, ' ')) AS DOUBLE), 6) AS dup_tok_frac,
        |  bg.top_bigram_n,
        |  round(bg.top_bigram_n / CAST(bg.n_bigrams AS DOUBLE), 6) AS top_bigram_frac,
        |  runs.max_run
        |FROM documents b
        |LEFT JOIN bg ON bg.doc_id = b.doc_id
        |LEFT JOIN runs ON runs.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q_text_pii" ->
      """WITH p AS (
        |  SELECT doc_id, text || ' contact user' || doc_id || '@example.com or 555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || CASE WHEN doc_id % 7 = 0 THEN ' and admin@test.org' ELSE '' END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text2, '555-[0-9]{4}')) AS INT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_text_inverted" ->
      """WITH pairs AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents))
        |SELECT term, count(*) AS df,
        |  array_to_string(list_transform(list_sort(list(doc_id))[1:20],
        |    x -> CAST(x AS VARCHAR)), ',') AS postings
        |FROM pairs GROUP BY term ORDER BY term""".stripMargin,

    // phrase search: positional postings + the adjacency self-join
    "q_text_phrase" ->
      """WITH p AS (SELECT doc_id,
        |    unnest(list_transform(range(len(string_split(text, ' '))),
        |      i -> {'pos': i, 'term': string_split(text, ' ')[i+1]})) AS u
        |  FROM documents),
        |pp AS (SELECT doc_id, u.pos AS pos, u.term AS term FROM p),
        |ph AS (SELECT * FROM (VALUES ('table value', 'table', 'value'),
        |  ('key agg', 'key', 'agg')) v(phrase, w1, w2))
        |SELECT ph.phrase, a.doc_id AS doc_id, count(*) AS n_hits
        |FROM ph JOIN pp a ON a.term = ph.w1
        |JOIN pp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  AND b.term = ph.w2
        |GROUP BY 1, 2 ORDER BY phrase, a.doc_id""".stripMargin,

    "q_embed_pool" ->
      """WITH x AS (
        |  SELECT label, unnest(embedding) AS v,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim
        |  FROM embeddings)
        |SELECT label, dim,
        |  CAST(floor(sum(round(CAST(v AS DOUBLE) * 1e6)) / count(*)) AS BIGINT)
        |    AS pooled_micro,
        |  count(*) AS n
        |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q_scd2_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 100 < 90),
        |changes AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 110) AS BIGINT) AS price_cents,
        |    'U' AS status
        |  FROM orders WHERE o_orderkey % 10 = 3)
        |SELECT b.k, b.price_cents, b.status, CAST(1 AS INT) AS version,
        |  c.k IS NULL AS is_current
        |FROM base b LEFT JOIN changes c ON c.k = b.k
        |UNION ALL
        |SELECT c.k, c.price_cents, c.status,
        |  CASE WHEN b.k IS NOT NULL THEN CAST(2 AS INT) ELSE CAST(1 AS INT) END AS version,
        |  TRUE AS is_current
        |FROM changes c LEFT JOIN base b ON b.k = c.k
        |ORDER BY k, version""".stripMargin,

    "q_scd2_asof" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 100 < 90),
        |news AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 110) AS BIGINT) AS price_cents,
        |    'U' AS status
        |  FROM orders c WHERE o_orderkey % 10 = 3
        |    AND NOT EXISTS (SELECT 1 FROM base b WHERE b.k = c.o_orderkey))
        |SELECT k, price_cents, status FROM base
        |UNION ALL
        |SELECT k, price_cents, status FROM news
        |ORDER BY k""".stripMargin,

    "q_incr_agg" ->
      """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_orderkey AS k, 1 AS seq, 'I' AS op,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', CAST(round(o_totalprice * 110) AS BIGINT)
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', NULL FROM orders WHERE o_orderkey % 7 = 0),
        |r AS (SELECT k, op, price_cents,
        |        row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        |      FROM log)
        |SELECT k, op, price_cents FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY k""".stripMargin,

    "q_histogram" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |st AS (SELECT min(c) AS lo, max(c) AS hi FROM c)
        |SELECT CAST(floor((c - lo) * 20 / CAST(hi - lo + 1 AS DOUBLE)) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM c, st GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name,
        |    count(*) - count(o_orderkey) AS n_nulls,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_s FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*) - count(o_custkey),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
        |    count(DISTINCT o_orderpriority),
        |    CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
        |  FROM orders)
        |ORDER BY col_name""".stripMargin)
}
