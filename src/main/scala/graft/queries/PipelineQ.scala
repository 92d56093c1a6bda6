package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingestion.{Fixtures => F, MetadataPipeline => P, model => M}

/** Part A pipeline stages as oracle-checked queries (A2, A6–A15).
  *
  * The input is the deterministic ZIP fixture corpus ([[graft.ingestion
  * .Fixtures]]) — real archive bytes exploded and parsed by the real
  * pipeline. The DuckDB oracle re-states the corpus's *logical* content as
  * VALUES tables and independently recomputes the gates, the book/genre
  * validation and the typed projection in SQL, so every relational decision
  * in the pipeline is differentially tested (ZIP/Properties byte-level
  * parsing is covered by the JVM-oracle property specs instead — DuckDB
  * cannot read ZIP-of-properties).
  */
object PipelineQ {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed ingest timestamp (2026-01-01T00:00:00Z): the reference stamps
    * `new Date()` (MetadataIngestionServiceImpl.java:222); pinned here so
    * both engines agree. */
  private val Ts = new Timestamp(1767225600000L)
  private val TsUs = 1767225600000000L
  private val cfg = M.IngestionConfig(inputDir = "unused", warehouseDir = "unused")

  private lazy val corpusDir: String = {
    val dir = new java.io.File("target/qscratch/pipeline_in")
    // fixed-byte corpus, but a concurrent cold reader could still observe a
    // half-written zip — build under the cross-JVM lock like every fixture
    graft.BuildOnce(dir) { F.writeCorpus(dir.getAbsolutePath) }
    dir.getAbsolutePath
  }

  private def gateBook(i: String): F.Book = F.books.find(_.isbn == i).get

  /** Run the pure pipeline transform over the corpus with gate state
    * pre-seeded to trip each of A9–A11 exactly once. */
  private def output(s: SparkSession): P.PipelineOutput = {
    val state = P.PipelineState(
      raw = s.createDataFrame(Seq(Tuple1(F.zipName(gateBook(F.IsbnGate1))))).toDF("zip_name"),
      workflow = s.createDataFrame(Seq(Tuple1(F.IsbnGate2))).toDF("isbn"),
      published = s.createDataFrame(Seq(Tuple1(F.IsbnGate3))).toDF("isbn"))
    P.process(s, P.readZips(s, corpusDir), state, cfg, Ts)
  }

  // ---- oracle prelude: the corpus's logical content as VALUES + the gate
  // ---- and validation logic recomputed in SQL ----

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private def zipRows: Seq[(String, String, Boolean, Boolean)] =
    F.books.map(b => (F.zipName(b), b.isbn, true, false)) ++ Seq(
      (F.zipName(F.noBook), F.noBook.isbn, true, false),
      ("not-a-book.zip", "", false, false),
      ("book-9781111111111.zip", "", false, false),
      (s"book-${F.IsbnCorrupt}-corrupt.zip", F.IsbnCorrupt, true, true))

  private def recordRows: Seq[(String, String, String, String)] =
    (F.books.map(b => (b, true)) :+ ((F.noBook, false))).flatMap { case (b, incl) =>
      F.recordsOf(b, incl).flatMap { case (k, props) =>
        props.toSeq.map { case (pk, pv) => (F.zipName(b), k, pk, pv) }
      }
    }

  private lazy val prelude: String = {
    val zips = zipRows.map { case (z, i, ok, c) => s"(${q(z)}, ${q(i)}, $ok, $c)" }
      .mkString(",\n    ")
    val recs = recordRows.map { case (z, k, pk, pv) =>
      s"(${q(z)}, ${q(k)}, ${q(pk)}, ${q(pv)})"
    }.mkString(",\n    ")
    val genres = cfg.genres.map(g => s"(${q(g)})").mkString(", ")
    s"""zips(zip_name, isbn, ok_isbn, corrupt) AS (VALUES
       |    $zips),
       |records(zip_name, record_key, pkey, pval) AS (VALUES
       |    $recs),
       |raw_state(zip_name) AS (VALUES (${q(F.zipName(gateBook(F.IsbnGate1)))})),
       |wf_state(isbn) AS (VALUES (${q(F.IsbnGate2)})),
       |pub_state(isbn) AS (VALUES (${q(F.IsbnGate3)})),
       |genres(g) AS (VALUES $genres),
       |gated AS (
       |  SELECT zip_name, isbn, corrupt FROM zips
       |  WHERE ok_isbn
       |    AND zip_name NOT IN (SELECT zip_name FROM raw_state)
       |    AND isbn NOT IN (SELECT isbn FROM wf_state)
       |    AND isbn NOT IN (SELECT isbn FROM pub_state)),
       |ok AS (
       |  SELECT z.zip_name, z.isbn FROM gated z
       |  WHERE NOT z.corrupt
       |    AND EXISTS (SELECT 1 FROM records r
       |                WHERE r.zip_name = z.zip_name AND r.record_key = z.isbn)
       |    AND EXISTS (SELECT 1 FROM records r JOIN genres g ON r.pval = g.g
       |                WHERE r.zip_name = z.zip_name AND r.record_key = z.isbn
       |                  AND r.pkey = ${q(M.PropKey.Genre)}))""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    // A13/A14: the typed 15-variable workflow projection, all_metadata
    // serialized deterministically (sorted record keys, sorted prop keys).
    "q_pipe_workflow" -> { (s, _) =>
      val ser = concat_ws("|", sort_array(transform(map_entries(col("all_metadata")), e =>
        concat(e.getField("key"), lit("{"),
          concat_ws(";", transform(sort_array(map_entries(e.getField("value"))), p =>
            concat(p.getField("key"), lit("="), p.getField("value")))),
          lit("}")))))
      output(s).newWorkflow.select(
        col("isbn"), col("workflow_description"), col("book_title"),
        col("book_genre"), col("book_authors"), col("nr_of_chapters"),
        col("nr_of_pages"),
        unix_micros(col("publishing_date")).as("publishing_ts_us"),
        col("content_found"), col("content_error_found"),
        col("metadata_chapter_matching_ok"), col("chapter_folder_hierarchy_exists"),
        col("interrupt_t1_timer_duration"), col("wait_2_check_content_timer_duration"),
        ser.as("all_metadata"))
        .orderBy(col("isbn"))
    },

    // A7/A8/A15 + A2: per-ZIP error routing to the dead letter.
    "q_pipe_dead_letter" -> { (s, _) =>
      output(s).deadLetter.select(col("zip_name"), col("error_code"))
        .orderBy(col("zip_name"), col("error_code"))
    },

    // A9–A11: which ZIPs each idempotency gate skipped.
    "q_pipe_skipped" -> { (s, _) =>
      output(s).skipped.orderBy(col("zip_name"))
    },

    // A12 (+A19 rollback semantics): raw zone receives exactly the fully
    // successful ZIPs. Content byte-equality is asserted in PipelineSpec;
    // here the oracle checks membership + schema.
    "q_pipe_raw" -> { (s, _) =>
      output(s).newRaw.select(col("zip_name"),
          (length(col("content")) > 0).as("has_content"),
          unix_micros(col("ingest_ts")).as("ingest_ts_us"))
        .orderBy(col("zip_name"))
    })

  val oracle: Map[String, String] = Map(
    "q_pipe_workflow" ->
      s"""WITH $prelude,
         |bp AS (
         |  SELECT o.zip_name, o.isbn,
         |    max(CASE WHEN r.pkey = ${q(M.PropKey.Title)} THEN r.pval END) AS book_title,
         |    max(CASE WHEN r.pkey = ${q(M.PropKey.Genre)} THEN r.pval END) AS book_genre,
         |    max(CASE WHEN r.pkey = ${q(M.PropKey.Authors)} THEN r.pval END) AS book_authors,
         |    max(CASE WHEN r.pkey = ${q(M.PropKey.NrOfChapters)} THEN r.pval END) AS nr_of_chapters,
         |    max(CASE WHEN r.pkey = ${q(M.PropKey.NrOfPages)} THEN r.pval END) AS nr_of_pages
         |  FROM ok o JOIN records r ON r.zip_name = o.zip_name AND r.record_key = o.isbn
         |  GROUP BY o.zip_name, o.isbn),
         |recser AS (
         |  SELECT r.zip_name, r.record_key || '{' ||
         |    string_agg(r.pkey || '=' || r.pval, ';' ORDER BY r.pkey) || '}' AS rec
         |  FROM records r JOIN ok o ON o.zip_name = r.zip_name
         |  GROUP BY r.zip_name, r.record_key),
         |meta AS (
         |  SELECT zip_name, string_agg(rec, '|' ORDER BY rec) AS all_metadata
         |  FROM recser GROUP BY zip_name)
         |SELECT bp.isbn,
         |  'Best Publishing workflow for ' || bp.isbn AS workflow_description,
         |  bp.book_title, bp.book_genre, bp.book_authors,
         |  bp.nr_of_chapters, bp.nr_of_pages,
         |  $TsUs AS publishing_ts_us,
         |  FALSE AS content_found, FALSE AS content_error_found,
         |  FALSE AS metadata_chapter_matching_ok,
         |  FALSE AS chapter_folder_hierarchy_exists,
         |  ${q(cfg.interruptT1TimerDuration)} AS interrupt_t1_timer_duration,
         |  ${q(cfg.wait2Check4ContentTimerDuration)} AS wait_2_check_content_timer_duration,
         |  m.all_metadata
         |FROM bp JOIN meta m ON m.zip_name = bp.zip_name
         |ORDER BY bp.isbn""".stripMargin,

    "q_pipe_dead_letter" ->
      s"""WITH $prelude,
         |errs AS (
         |  SELECT zip_name, ${q(M.ErrorCode.MissingIsbn)} AS error_code
         |  FROM zips WHERE NOT ok_isbn
         |  UNION ALL
         |  SELECT zip_name, ${q(M.ErrorCode.ExtractZip)} FROM gated WHERE corrupt
         |  UNION ALL
         |  SELECT z.zip_name, ${q(M.ErrorCode.MissingBookMetadata)}
         |  FROM gated z WHERE NOT z.corrupt AND NOT EXISTS (
         |    SELECT 1 FROM records r
         |    WHERE r.zip_name = z.zip_name AND r.record_key = z.isbn)
         |  UNION ALL
         |  SELECT z.zip_name, ${q(M.ErrorCode.InvalidGenre)}
         |  FROM gated z WHERE NOT z.corrupt
         |    AND EXISTS (SELECT 1 FROM records r
         |                WHERE r.zip_name = z.zip_name AND r.record_key = z.isbn)
         |    AND NOT EXISTS (SELECT 1 FROM records r JOIN genres g ON r.pval = g.g
         |                    WHERE r.zip_name = z.zip_name AND r.record_key = z.isbn
         |                      AND r.pkey = ${q(M.PropKey.Genre)}))
         |SELECT zip_name, error_code FROM errs ORDER BY zip_name, error_code""".stripMargin,

    "q_pipe_skipped" ->
      s"""WITH $prelude,
         |sk AS (
         |  SELECT zip_name, isbn, ${q(M.SkipGate.AlreadyUploaded)} AS gate FROM zips
         |  WHERE ok_isbn AND zip_name IN (SELECT zip_name FROM raw_state)
         |  UNION ALL
         |  SELECT zip_name, isbn, ${q(M.SkipGate.WorkflowExists)} FROM zips
         |  WHERE ok_isbn AND zip_name NOT IN (SELECT zip_name FROM raw_state)
         |    AND isbn IN (SELECT isbn FROM wf_state)
         |  UNION ALL
         |  SELECT zip_name, isbn, ${q(M.SkipGate.IsbnFolderExists)} FROM zips
         |  WHERE ok_isbn AND zip_name NOT IN (SELECT zip_name FROM raw_state)
         |    AND isbn NOT IN (SELECT isbn FROM wf_state)
         |    AND isbn IN (SELECT isbn FROM pub_state))
         |SELECT zip_name, isbn, gate FROM sk ORDER BY zip_name""".stripMargin,

    "q_pipe_raw" ->
      s"""WITH $prelude
         |SELECT zip_name, TRUE AS has_content, $TsUs AS ingest_ts_us
         |FROM ok ORDER BY zip_name""".stripMargin)
}
