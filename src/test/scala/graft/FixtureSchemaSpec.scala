package graft

import org.apache.spark.sql.types.DataType

/** Schema-drift guard for EVERY driver-owned fixture table — the
  * generalized r9 lesson (a regeneration silently flipped `events.ts` from
  * TIMESTAMP(NANOS) to TIMESTAMP_NTZ and zeroed 35 catalog entries before
  * any test noticed; TsEncodingSpec now pins the ts ENCODINGS, this spec
  * pins every loader's column surface and type families). A future
  * regeneration that renames a column, changes a numeric family, or moves
  * another timestamp column to a new encoding fails HERE, loudly, with the
  * incident reference — not as 30 silently-absent correctness rows.
  *
  * Timestamp columns accept the encodings the catalog actually handles:
  * `timestamp` / `timestamp_ntz` (queries reach them through to_date() /
  * TsNorm), plus `bigint` for events.ts (the nanos-long era). Anything
  * else is a NEW encoding the loaders have never seen — fail and decide,
  * don't guess. */
class FixtureSchemaSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private val Ts = Set("timestamp", "timestamp_ntz")

  /** table -> required (column -> accepted simple type names). Extra
    * columns are tolerated (additive drift is safe); missing or retyped
    * ones are not. */
  private val expected: Map[String, Map[String, Set[String]]] = Map(
    "region" -> Map("r_regionkey" -> Set("int", "bigint"),
      "r_name" -> Set("string")),
    "nation" -> Map("n_nationkey" -> Set("int", "bigint"),
      "n_name" -> Set("string"), "n_regionkey" -> Set("int", "bigint")),
    "customer" -> Map("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int", "bigint"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Map("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int", "bigint"), "s_acctbal" -> Set("double")),
    "part" -> Map("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int", "bigint"), "p_retailprice" -> Set("double")),
    "orders" -> Map("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Map("l_orderkey" -> Set("bigint"),
      "l_partkey" -> Set("bigint"), "l_suppkey" -> Set("bigint"),
      "l_linenumber" -> Set("int", "bigint"), "l_quantity" -> Set("double"),
      "l_extendedprice" -> Set("double"), "l_discount" -> Set("double"),
      "l_tax" -> Set("double"), "l_returnflag" -> Set("string"),
      "l_linestatus" -> Set("string"), "l_shipdate" -> Ts),
    "documents" -> Map("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Map("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>", "array<double>"),
      "label" -> Set("int", "bigint")))

  expected.foreach { case (table, cols) =>
    test(s"$table fixture schema matches what the loaders accept") {
      val schema = Tables.load(spark, sf, table).schema
      val actual = schema.fields.map(f =>
        f.name -> f.dataType.simpleString.toLowerCase).toMap
      cols.foreach { case (name, types) =>
        val got = actual.get(name)
        assert(got.exists(types),
          s"$table.$name is ${got.getOrElse("MISSING")}, loaders accept " +
            s"${types.mkString("/")} — a driver-side regeneration changed " +
            "the fixture surface (the r9 events.ts incident class); " +
            "update the loader AND this guard deliberately, together")
      }
    }
  }

  test("events fixture schema matches what TsNorm accepts") {
    // events goes through TsNorm, so the RAW schema is checked here (the
    // normalized surface is pinned by TsEncodingSpec)
    val raw = Tables.load(spark, sf, "events").schema
    val tsType = raw.fields.find(_.name == "ts").map(_.dataType.simpleString)
    assert(tsType.exists(t => (Ts + "bigint")(t.toLowerCase)),
      s"events.ts is ${tsType.getOrElse("MISSING")} — a ts encoding TsNorm " +
        "has never seen; extend graft.TsNorm and TsEncodingSpec together")
    Seq("event_id" -> "bigint", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string")
      .foreach { case (n, t) =>
        val got = raw.fields.find(_.name == n).map(_.dataType.simpleString)
        assert(got.contains(t), s"events.$n is ${got.getOrElse("MISSING")}, expected $t")
      }
  }

  test("normalized events surface: ts is session TIMESTAMP + ts_nanos LONG") {
    val norm = Tables.events(spark, sf).schema
    def tpe(n: String): Option[DataType] =
      norm.fields.find(_.name == n).map(_.dataType)
    assert(tpe("ts").map(_.simpleString).contains("timestamp"))
    assert(tpe("ts_nanos").map(_.simpleString).contains("bigint"))
  }
}
