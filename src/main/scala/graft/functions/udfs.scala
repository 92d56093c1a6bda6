package graft.functions

import java.io.ByteArrayInputStream
import java.util.Properties
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Declared UDF surface (SURVEY.md §2 B46).
  *
  * Kept deliberately tiny: everything else in the engine is built-in
  * `org.apache.spark.sql.functions` (codegen'd). These two exist because
  * their exact semantics cannot be reproduced with built-ins:
  *
  *  - `parse_properties`: `java.util.Properties.load` fidelity — ISO-8859-1,
  *    `=`/`:`/whitespace separators, backslash line continuations, `\uXXXX`
  *    escapes (reference MetadataIngestionServiceImpl.java:148–150).
  *    `str_to_map` is NOT equivalent (SURVEY.md §7 hard parts).
  *  - `isbn13_valid`: ISBN-13 mod-10 checksum for the filename contract
  *    (reference MetadataIngestionExecuter.java:57).
  */
object udfs {

  /** Exact `java.util.Properties.load` parse of raw entry bytes. */
  def parseProperties(bytes: Array[Byte]): Map[String, String] = {
    if (bytes == null) Map.empty
    else {
      val p = new Properties()
      p.load(new ByteArrayInputStream(bytes))
      p.asScala.toMap
    }
  }

  val parse_properties: UserDefinedFunction =
    udf((bytes: Array[Byte]) => parseProperties(bytes))

  /** ISBN-13 checksum: weights 1,3 alternating; valid iff total % 10 == 0. */
  def isbn13Valid(s: String): Boolean =
    s != null && s.length == 13 && s.forall(_.isDigit) && {
      val sum = s.zipWithIndex.map { case (c, i) =>
        (c - '0') * (if (i % 2 == 0) 1 else 3)
      }.sum
      sum % 10 == 0
    }

  val isbn13_valid: UserDefinedFunction = udf((s: String) => isbn13Valid(s))

  /** Register both for the SQL surface. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("parse_properties", parse_properties)
    spark.udf.register("isbn13_valid", isbn13_valid)
  }
}
