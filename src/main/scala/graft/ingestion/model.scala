package graft.ingestion

/** Typed model for the metadata-ingestion pipeline (SURVEY.md §1/§2 Part A).
  *
  * Mirrors the reference's dataflow semantics (one ZIP per book, ISBN in the
  * filename, `.properties` entries for the book + each chapter; see
  * reference MetadataIngestionServiceImpl.java:95–123) re-expressed as a
  * typed Spark schema instead of `HashMap<String, Properties>`.
  */
object model {

  /** One non-directory ZIP entry, or an extraction error for the whole ZIP.
    * `error` is None for data rows; Some(code) rows carry no entry. */
  case class ZipEntryRow(
      zip_path: String,
      zip_name: String,
      isbn: String,
      entry_name: String,
      record_key: String,
      bytes: Array[Byte],
      error: Option[String])

  /** Typed error codes — mirrors the reference's ProcessingErrorCode usage
    * (MetadataIngestionServiceImpl.java:109, 115, 158) plus the
    * filename-contract failure (MetadataIngestionExecuter.java:62). */
  object ErrorCode {
    val MissingIsbn = "METADATA_INGESTION_MISSING_ISBN"
    val MissingBookMetadata = "METADATA_INGESTION_MISSING_BOOK_METADATA"
    val InvalidGenre = "METADATA_INGESTION_INVALID_GENRE"
    val ExtractZip = "METADATA_INGESTION_EXTRACT_ZIP"
  }

  /** Pipeline configuration ≙ alfresco-global.properties:7–19 (cadence,
    * timers) + ingestion-context.xml wiring (paths, genre dimension). */
  case class IngestionConfig(
      inputDir: String,
      warehouseDir: String,
      genres: Seq[String] = Seq("Fiction", "NonFiction", "Biography",
        "Children", "Poetry", "Reference"),
      interruptT1TimerDuration: String = "PT5M",
      wait2Check4ContentTimerDuration: String = "PT1M",
      pollInterval: String = "10 seconds")

  /** Column sets of the three sinks. */
  val RawZoneCols = Seq("zip_name", "content", "ingest_ts")
  val DeadLetterCols = Seq("zip_name", "error_code", "message", "ts")
  /** Workflow sink ≙ the 14 process variables assembled at
    * MetadataIngestionServiceImpl.java:225–244. */
  val WorkflowCols = Seq(
    "isbn", "book_title", "book_genre", "book_authors", "nr_of_chapters",
    "nr_of_pages", "description", "publishing_date", "year",
    "chapter_folder_created", "content_received", "content_linked",
    "metadata_complete", "interrupt_t1_timer", "wait2check_timer",
    "all_metadata")
}
