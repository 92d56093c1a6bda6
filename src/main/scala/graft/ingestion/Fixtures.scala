package graft.ingestion

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Deterministic ZIP fixture corpus for the Part A pipeline: exercised by
  * the pipeline CORRECTNESS queries ([[graft.queries.PipelineQ]]) and the
  * golden end-to-end specs. Covers every reference code path:
  *
  *  - 3 fresh valid books (→ workflow rows);
  *  - 3 valid books pre-seeded into one gate table each (→ skipped, A9–A11);
  *  - 1 ZIP whose book record is missing (A7), 1 with an invalid genre (A8),
  *    1 corrupt archive (A15/EXTRACT_ZIP), 1 with no usable ISBN in the
  *    filename, 1 whose ISBN fails the mod-10 checksum (A2 contract).
  *
  * All bytes are deterministic: fixed entry timestamps, stored (no-compress)
  * entries, ASCII `key=value` properties.
  */
object Fixtures {

  /** ISBN-13 with a valid check digit from a 9-digit serial. */
  def isbn(serial: Int): String = {
    val base = "978" + f"$serial%09d"
    val sum = base.zipWithIndex.map { case (c, i) =>
      (c - '0') * (if (i % 2 == 0) 1 else 3)
    }.sum
    base + ((10 - sum % 10) % 10).toString
  }

  val IsbnFresh1 = isbn(1)  // fresh valid
  val IsbnFresh2 = isbn(2)
  val IsbnFresh3 = isbn(3)
  val IsbnGate1 = isbn(11)  // pre-seeded in raw zone (gate 1)
  val IsbnGate2 = isbn(12)  // pre-seeded in workflow table (gate 2)
  val IsbnGate3 = isbn(13)  // pre-seeded in published table (gate 3)
  val IsbnNoBook = isbn(21) // ZIP without a {isbn}.txt book record
  val IsbnBadGenre = isbn(22)
  /** Valid ISBN in the filename but unreadable archive bytes — passes the
    * filename contract, fails at extraction (EXTRACT_ZIP). */
  val IsbnCorrupt: String = isbn(31)

  /** Logical book fixture: ISBN → (title, genre, authors, chapters). */
  case class Book(isbn: String, title: String, genre: String,
                  authors: String, nrOfPages: Int, chapters: Seq[String])

  val books: Seq[Book] = Seq(
    Book(IsbnFresh1, "A First Book", "Fiction", "Ada Author", 200,
      Seq("Intro", "Middle", "End")),
    Book(IsbnFresh2, "Second Steps", "Biography", "Bob Biographer", 310,
      Seq("Early Years", "Later Years")),
    Book(IsbnFresh3, "Third Time", "Poetry", "Cara Poet", 90,
      Seq("Verses")),
    Book(IsbnGate1, "Gated One", "Fiction", "Dan Dupe", 150, Seq("Only")),
    Book(IsbnGate2, "Gated Two", "Children", "Eve Again", 40, Seq("Only")),
    Book(IsbnGate3, "Gated Three", "Reference", "Fay Done", 500, Seq("Only")),
    Book(IsbnBadGenre, "Wrong Shelf", "Cooking", "Gil Genre", 120, Seq("Only")))

  /** ZIP whose book record is absent (chapters only) — A7 error path. */
  val noBook: Book = Book(IsbnNoBook, "Headless", "Fiction", "No One", 10, Seq("Lost"))

  def zipName(b: Book): String = s"book-${b.isbn}.zip"

  /** `java.util.Properties`-format book record (parse fidelity for escapes/
    * continuations is property-tested separately; fixtures stay ASCII so the
    * DuckDB oracle can re-state them as VALUES literals). */
  def bookProps(b: Book): Map[String, String] = Map(
    model.PropKey.Title -> b.title,
    model.PropKey.Genre -> b.genre,
    model.PropKey.Authors -> b.authors,
    model.PropKey.NrOfChapters -> b.chapters.size.toString,
    model.PropKey.NrOfPages -> b.nrOfPages.toString)

  def chapterProps(b: Book, i: Int): Map[String, String] = Map(
    "ChapterTitle" -> b.chapters(i),
    "ChapterNr" -> (i + 1).toString)

  /** All logical records of one book ZIP: record_key → props. */
  def recordsOf(b: Book, includeBook: Boolean = true): Seq[(String, Map[String, String])] = {
    val book = if (includeBook) Seq(b.isbn -> bookProps(b)) else Nil
    book ++ b.chapters.indices.map(i => f"chapter${i + 1}%02d" -> chapterProps(b, i))
  }

  private val FixedTime = 1577836800000L // 2020-01-01T00:00:00Z

  private def propBytes(props: Map[String, String]): Array[Byte] =
    props.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n").getBytes("ISO-8859-1")

  /** Deterministic ZIP bytes: STORED entries, fixed mtime, sorted keys. */
  def zipBytes(entries: Seq[(String, Array[Byte])], withDirEntry: Boolean = true): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, bytes: Array[Byte]): Unit = {
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      e.setMethod(ZipEntry.STORED)
      e.setSize(bytes.length)
      e.setCompressedSize(bytes.length)
      val crc = new java.util.zip.CRC32(); crc.update(bytes)
      e.setCrc(crc.getValue)
      zos.putNextEntry(e); zos.write(bytes); zos.closeEntry()
    }
    if (withDirEntry) { // directory entries must be skipped (ref :142)
      val d = new ZipEntry("meta/")
      d.setTime(FixedTime)
      zos.putNextEntry(d); zos.closeEntry()
    }
    entries.foreach { case (n, b) => put(n, b) }
    zos.close()
    bos.toByteArray
  }

  def zipOf(b: Book, includeBook: Boolean = true): Array[Byte] =
    zipBytes(recordsOf(b, includeBook).map { case (k, props) =>
      s"$k.txt" -> propBytes(props)
    })

  /** Write the full corpus into `dir`; returns the directory. Idempotent
    * (fixed bytes, plain overwrite). */
  def writeCorpus(dir: String): String = {
    val d = new File(dir)
    d.mkdirs()
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new File(d, name))
      try f.write(bytes) finally f.close()
    }
    books.foreach(b => write(zipName(b), zipOf(b)))
    write(zipName(noBook), zipOf(noBook, includeBook = false))
    write("not-a-book.zip", zipBytes(Seq("whatever.txt" -> propBytes(Map("a" -> "b")))))
    write("book-9781111111111.zip", // bad check digit → MissingIsbn
      zipBytes(Seq("whatever.txt" -> propBytes(Map("a" -> "b")))))
    write(s"book-$IsbnCorrupt-corrupt.zip",
      Array[Byte](1, 2, 3, 4, 5)) // not a ZIP → EXTRACT_ZIP
    d.getAbsolutePath
  }
}
