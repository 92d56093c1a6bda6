package graft.functions

import java.io.ByteArrayInputStream
import java.util.Properties
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/** SURVEY.md §5.2-3: `parse_properties` ≡ `java.util.Properties.load` —
  * the exact-semantics contract (ISO-8859-1, '='/':'/whitespace separators,
  * backslash continuations, \uXXXX escapes, comment lines) that rules out
  * `str_to_map` (reference MetadataIngestionServiceImpl.java:148–150). */
class PropertiesSpec extends SparkSpecBase {

  private def reference(bytes: Array[Byte]): Map[String, String] = {
    val p = new Properties()
    p.load(new ByteArrayInputStream(bytes))
    p.asScala.toMap
  }

  test("hand-picked Properties syntax corners parse exactly") {
    val cases = Seq(
      "k=v",
      "k v",                        // whitespace separator
      "k:v",                        // colon separator
      "k = spaced value  ",         // value keeps trailing spaces
      "  indented.key=x",
      "k=line one\\\n   continued", // backslash continuation
      "# comment\n! also comment\nk=v",
      "empty=",
      "esc\\:aped=colon in key",
      "unicode=\\u00e9\\u4e2d",
      "tab\\tkey=v",
      "k=v1\nk=v2",                 // last occurrence wins
      "")
    cases.foreach { text =>
      val bytes = text.getBytes("ISO-8859-1")
      assert(udfs.parseProperties(bytes) === reference(bytes), s"case: <$text>")
    }
  }

  test("property: parse_properties == Properties.load on arbitrary ISO-8859-1 bytes") {
    // keys/values over a charset that exercises separators, escapes,
    // comments and continuations when concatenated arbitrarily
    val chunk = Gen.stringOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('=', ':', ' ', '\t', '\\', '#', '!', '\n', 'é', 'u', '0')))
    val prop = Prop.forAll(Gen.listOf(chunk)) { chunks =>
      val bytes = chunks.mkString("\n").getBytes("ISO-8859-1")
      // malformed \uXXXX escapes make Properties.load throw — equivalence
      // includes throwing the same exception class
      def run(f: => Map[String, String]): Either[Class[_], Map[String, String]] =
        try Right(f) catch { case e: Exception => Left(e.getClass) }
      run(udfs.parseProperties(bytes)) == run(reference(bytes))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("the registered UDF parses binary columns inside a Spark plan") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "Title=Book One\nGenre=Fiction".getBytes("ISO-8859-1")),
      ("b", "x:1\ny 2\n# z=3".getBytes("ISO-8859-1")))
      .toDF("id", "bytes")
      .withColumn("props", udfs.parse_properties(col("bytes")))
      .select(col("id"), element_at(col("props"), "Title").as("t"),
        element_at(col("props"), "x").as("x"),
        element_at(col("props"), "y").as("y"),
        element_at(col("props"), "z").as("z"))
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getString(1) === "Book One")
    assert(rows(1).getString(2) === "1")
    assert(rows(1).getString(3) === "2")
    assert(rows(1).isNullAt(4)) // comment line never becomes a key
  }

  test("isbn13Valid checksum") {
    assert(udfs.isbn13Valid("9780306406157")) // canonical example
    assert(!udfs.isbn13Valid("9780306406158"))
    assert(!udfs.isbn13Valid("978030640615"))
    assert(!udfs.isbn13Valid(null))
    assert((0 to 50).forall(n => udfs.isbn13Valid(graft.ingestion.Fixtures.isbn(n))))
  }
}
