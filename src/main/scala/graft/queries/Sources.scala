package graft.queries

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.ZOrder

/** Source formats beyond parquet (SURVEY.md §2 B2/B3/B4) plus the declared
  * family members the round-1 catalog never exercised (B12 right join, B38
  * xxhash64 / monotonically_increasing_id / input_file_name).
  *
  * The format queries round-trip real data through scratch files (written
  * deterministically from the parquet tables at plan time) and read them
  * back through the source under test; the DuckDB oracle computes the same
  * values straight from parquet — so a schema/typing/quoting bug in either
  * direction of the format path breaks the hash.
  */
object Sources {
  type Q = (SparkSession, String) => DataFrame

  /** Per-sf scratch root (the same sf dir always maps to the same path). */
  private def scratch(d: String, kind: String): String =
    new File("target/qscratch/src_" + kind + "_" +
      d.replaceAll("[^a-zA-Z0-9.]", "_")).getAbsolutePath

  /** B4 fixture: one .txt file per document (doc_id < 100), bytes = text.
    * NOTE: the driver-side `.collect()` below is a test-fixture writer,
    * hard-capped at 100 docs — deliberately NOT a production pattern; a
    * real corpus export is a distributed `df.write` (see B5), never a
    * driver loop. */
  private def binCorpus(s: SparkSession, d: String): String = {
    val dir = scratch(d, "bin")
    graft.BuildOnce(new File(dir)) {
      Tables.documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text")).collect()
        .foreach { r =>
          Files.write(Paths.get(dir, s"${r.getLong(0)}.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
    }
    dir
  }

  /** The binaryFile scan over the doc corpus: (doc_id, content). */
  def binaryDocs(s: SparkSession, d: String): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", "*.txt")
      .load(binCorpus(s, d))
      .select(regexp_extract(col("path"), "([0-9]+)\\.txt$", 1).cast("long").as("doc_id"),
        col("length"), col("content"))

  /** Register `tbl` as a bucketed parquet table at `path`, building the
    * files only when the source's fingerprint differs from the one recorded
    * at build time. A bare existence sentinel would silently serve STALE
    * buckets if the source were ever regenerated in place; the fingerprint
    * is the sorted (path, length, mtime) listing of the source's input
    * files — metadata-only (no data scan: a row-hash fingerprint would
    * re-read the whole source per registration, unpayable at 100 TB), and
    * any in-place regeneration moves an mtime. Falls back to a one-scan
    * row hash for non-file sources. Re-registration goes through DDL
    * because bucket metadata lives in the catalog, not the parquet
    * footer. */
  private[graft] def ensureBucketed(s: SparkSession, tbl: String, path: String,
                                    key: String, ddlCols: String,
                                    src: => DataFrame): Unit = {
    val df = src
    val files = df.inputFiles
    val fp =
      if (files.nonEmpty) {
        val conf = s.sparkContext.hadoopConfiguration
        // SHA-256 of the full listing, not String.hashCode: a 32-bit hash
        // leaves a collision window where a regenerated source would
        // silently serve stale buckets.
        val listing = files.sorted.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val st = p.getFileSystem(conf).getFileStatus(p)
          s"$f:${st.getLen}:${st.getModificationTime}"
        }.mkString("|")
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
      } else {
        // decimal sum: ANSI mode would throw on a bigint overflow; the hash
        // sum is commutative, so partitioning/order can't move it
        val fpRow = df.agg(count(lit(1)), max(col(key)),
          sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).head()
        s"${fpRow.get(0)}_${fpRow.get(1)}_${fpRow.get(2)}"
      }
    val marker = Paths.get(path, "_built")
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    // fingerprint re-checked INSIDE the cross-JVM lock: the cold-start
    // loser finds the winner's marker and registers instead of rebuilding
    graft.BuildOnce.locked(new java.io.File(path)) {
      if (Files.exists(marker) &&
          new String(Files.readAllBytes(marker), "UTF-8") == fp)
        s.sql(s"""CREATE TABLE $tbl ($ddlCols) USING parquet
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                 |LOCATION '$path'""".stripMargin)
      else {
        df.write.bucketBy(8, key).sortBy(key)
          .option("path", path).mode("overwrite").saveAsTable(tbl)
        Files.write(marker, fp.getBytes("UTF-8"))
      }
    }
  }

  val defs: Map[String, Q] = Map(
    // B2 CSV: write nation as header-CSV, read back with an explicit schema.
    "q_csv_roundtrip" -> { (s, d) =>
      val dir = scratch(d, "csv")
      Tables.nation(s, d).coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(dir)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("header", "true").csv(dir)
        .orderBy(col("n_nationkey"))
    },

    // B3 JSON-lines: orders subset through json write/read with schema.
    "q_json_roundtrip" -> { (s, d) =>
      val dir = scratch(d, "json")
      Tables.orders(s, d).filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          to_date(col("o_orderdate")).as("o_date"))
        .coalesce(1).write.mode("overwrite").json(dir)
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_date", DateType)))
      s.read.schema(schema).json(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          QUtil.moneySum(col("o_totalprice"), 2).as("total"),
          max(col("o_date")).as("last_date"))
        .orderBy(col("o_orderstatus"))
    },

    // B5 schema evolution: two parquet batches with different schemas under
    // one root (hive-style b=N partition dirs), read back with
    // mergeSchema=true — batch 1 predates the o_orderstatus column and
    // surfaces it as NULL. The per-file-footer merge is the schema-drift
    // story a years-long 100 TB ingest needs (mergeSchema costs a footer
    // read per file — enable it on evolving zones, not hot paths).
    "q_schema_merge" -> { (s, d) =>
      val dir = scratch(d, "evolve")
      val orders = Tables.orders(s, d)
      orders.filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$dir/b=1")
      orders.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 300)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$dir/b=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .groupBy(col("b"), coalesce(col("o_orderstatus"), lit("pre_schema")).as("status"))
        .agg(count(lit(1)).as("n"), QUtil.moneySum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("b"), col("status"))
    },

    // B2 malformed-row routing: PERMISSIVE CSV read with a corrupt-record
    // column — planted unparsable rows land in _corrupt with every typed
    // field NULL, clean rows parse; the source-level half of the pipeline's
    // dead-letter discipline (A15). Counts + key ranges per class prove
    // nothing is dropped and nothing leaks across.
    "q_csv_permissive" -> { (s, d) =>
      val dir = scratch(d, "badcsv")
      val nation = Tables.nation(s, d)
      nation.select(concat_ws(",",
          col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
        .unionByName(nation.filter(col("n_nationkey") % 5 === 0)
          .select(concat(lit("x"), col("n_name"), lit(",oops")).as("value")))
        .orderBy(col("value")).coalesce(1)
        .write.mode("overwrite").text(dir)
      val schema = StructType(Seq(
        StructField("k", IntegerType),
        StructField("name", StringType),
        StructField("region", IntegerType),
        StructField("_corrupt", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(dir)
        .groupBy(col("_corrupt").isNotNull.as("is_corrupt"))
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_keys"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("is_corrupt"))
    },

    // ORC write/read round-trip (the second columnar format Spark ships).
    "q_orc_roundtrip" -> { (s, d) =>
      val dir = scratch(d, "orc")
      Tables.supplier(s, d)
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          QUtil.moneySum(col("s_acctbal"), 2).as("total_bal"))
        .orderBy(col("s_nationkey"))
    },

    // B2 Avro round-trip — the row-oriented interchange format next to
    // CSV/JSON/ORC. This Spark build ships avro-core/avro-mapred but NOT
    // the spark-avro datasource module, so the entry goes through the
    // public Hadoop-IO route (AvroKeyOutputFormat / AvroKeyInputFormat
    // over standard Avro container files) — the sanctioned RDD escape
    // hatch: per-record imperative construction nothing in the DataFrame
    // API expresses without the connector. Both directions stay
    // DISTRIBUTED (saveAsNewAPIHadoopFile / newAPIHadoopFile — one task
    // per partition/file, no driver loop); records are mapped to plain
    // tuples inside the same stage, so Hadoop's record-object reuse and
    // Avro's Utf8 strings never escape the iterator. The aggregate
    // proves long/string/int/double values all survived the trip.
    "q_avro_roundtrip" -> { (s, d) =>
      import org.apache.avro.Schema
      import org.apache.avro.generic.{GenericData, GenericRecord}
      import org.apache.avro.mapred.AvroKey
      import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
      import org.apache.hadoop.io.NullWritable
      import org.apache.hadoop.mapreduce.Job
      val dir = scratch(d, "avro")
      val schemaJson =
        """{"type":"record","name":"Supplier","fields":[
          |{"name":"s_suppkey","type":"long"},
          |{"name":"s_name","type":"string"},
          |{"name":"s_nationkey","type":"int"},
          |{"name":"s_acctbal","type":"double"}]}""".stripMargin
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val pairs = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
        .rdd.mapPartitions { it =>
          val sch = new Schema.Parser().parse(schemaJson)
          it.map { r =>
            val rec = new GenericData.Record(sch)
            rec.put("s_suppkey", r.getLong(0))
            rec.put("s_name", r.getString(1))
            rec.put("s_nationkey", r.getInt(2))
            rec.put("s_acctbal", r.getDouble(3))
            (new AvroKey[GenericRecord](rec), NullWritable.get())
          }
        }
      val wjob = Job.getInstance(s.sparkContext.hadoopConfiguration)
      AvroJob.setOutputKeySchema(wjob, new Schema.Parser().parse(schemaJson))
      pairs.saveAsNewAPIHadoopFile(dir, classOf[AvroKey[GenericRecord]],
        classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
        wjob.getConfiguration)
      val rjob = Job.getInstance(s.sparkContext.hadoopConfiguration)
      AvroJob.setInputKeySchema(rjob, new Schema.Parser().parse(schemaJson))
      import s.implicits._
      val back = s.sparkContext.newAPIHadoopFile(dir,
          classOf[AvroKeyInputFormat[GenericRecord]],
          classOf[AvroKey[GenericRecord]], classOf[NullWritable],
          rjob.getConfiguration)
        .map { case (k, _) =>
          val r = k.datum()
          (r.get("s_suppkey").asInstanceOf[Long], r.get("s_name").toString,
            r.get("s_nationkey").asInstanceOf[Int],
            r.get("s_acctbal").asInstanceOf[Double])
        }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      back.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          max(length(col("s_name"))).as("max_name_len"),
          QUtil.moneySum(col("s_acctbal"), 2).as("total_bal"),
          sum(col("s_suppkey")).as("key_sum"))
        .orderBy(col("s_nationkey"))
    },

    // B4 binaryFile: real file bytes back out of the source, digest-checked.
    "q_binaryfile_scan" -> { (s, d) =>
      binaryDocs(s, d)
        .select(col("doc_id"), col("length").as("n_bytes"),
          sha2(col("content"), 256).as("digest"))
        .orderBy(col("doc_id"))
    },

    // B12 right outer join (the declared-but-never-exercised variant).
    "q_join_right" -> { (s, d) =>
      Tables.orders(s, d).filter(col("o_totalprice") > 150000)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment"))
    },

    // B5 partitioned write → partition-pruned read, end to end: orders land
    // year-partitioned ({year} layout ≙ reference documentLibrary/{year}/
    // {isbn}, MetadataIngestionServiceImpl.java:200–202); the year filter
    // then prunes at the DIRECTORY level — the scan never opens the other
    // years' files (PartitionPruneSpec asserts the PartitionFilters plan
    // shape; this row hash-checks the pruned read's values).
    "q_partition_prune" -> { (s, d) =>
      val dir = scratch(d, "part")
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_year") === 1997)
        .groupBy(month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"), QUtil.moneySum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("mo"))
    },

    // B5/B10 dynamic partition pruning: the fact side is partitioned by
    // year and carries NO static year filter — the pruning predicate
    // arrives at runtime from the broadcast dim's `era` filter (Catalyst
    // injects a dynamicpruning subquery into the scan's PartitionFilters;
    // PlanSpec asserts it survives). THE mechanism that keeps a
    // star-schema query from scanning all of a 100 TB fact when the filter
    // lives on the dimension.
    "q_dpp_join" -> { (s, d) =>
      val dir = scratch(d, "dpp")
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir)
      // the dim must be a file relation: DPP's benefit estimator works on
      // scan stats, and a driver-local relation never triggers it
      s.createDataFrame((1995 to 2001).map(y =>
        (y, if (y <= 1998) "early" else "late"))).toDF("o_year", "era")
        .write.mode("overwrite").parquet(s"$dir-dim")
      val dim = s.read.parquet(s"$dir-dim")
      s.read.parquet(dir)
        .join(broadcast(dim.filter(col("era") === "late")), Seq("o_year"))
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"), QUtil.moneySum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("o_year"))
    },

    // B11 co-located bucketed join, end to end: both sides pre-bucketed on
    // the join key (pay the shuffle ONCE at write time), then joined with
    // zero Exchange in the plan (BucketJoinSpec asserts that); this row
    // hash-checks the join's values. The 100 TB recipe for repeated
    // large×large joins on a stable key. The bucketed files are built once
    // per sf and re-registered via DDL on later runs (bucket metadata
    // lives in the catalog, not the parquet footer) — exactly the
    // write-once-read-many economics the operator exists for; a source
    // fingerprint (row count + max key) keys the rebuild-skip, so
    // regenerated source data can never serve stale buckets.
    "q_bucket_join" -> { (s, d) =>
      val wh = scratch(d, "bkt")
      ensureBucketed(s, "graft_li_b", s"$wh/li", "l_orderkey",
        "l_orderkey BIGINT, l_quantity DOUBLE",
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity"))
      ensureBucketed(s, "graft_ord_b", s"$wh/ord", "o_orderkey",
        "o_orderkey BIGINT, o_orderstatus STRING",
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus"))
      s.table("graft_li_b")
        .hint("merge")
        .join(s.table("graft_ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    },

    // B3-adjacent text source round-trip (the 6th format next to parquet/
    // CSV/JSON/ORC/binaryFile — raw text lines are how LLM corpora ship):
    // one "doc_id|text" line per document out through the text sink, parsed
    // back with a limit-2 split (embedded separators stay in the text), and
    // reduced to per-doc stats the oracle recomputes from the parquet.
    "q_text_roundtrip" -> { (s, d) =>
      val dir = scratch(d, "txt")
      Tables.documents(s, d)
        .select(concat_ws("|", col("doc_id"), col("text")).as("value"))
        .write.mode("overwrite").text(dir)
      s.read.text(dir)
        .select(split(col("value"), "\\|", 2).as("p"))
        .select(element_at(col("p"), 1).cast("long").as("doc_id"),
          element_at(col("p"), 2).as("text"))
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          size(split(col("text"), " ")).as("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // B5 sorted-layout write → stats-pruned scan: orders written
    // range-partitioned AND sorted by o_orderdate, so every parquet
    // row-group's min/max date stats are tight and a date-range read
    // discharges most row groups from their footer alone — the third
    // layout recipe next to q_partition_prune (directory pruning, best for
    // low-cardinality keys) and q_bucket_join (co-located joins): sort on
    // the RANGE-scanned column. The pushed filter (PushedFilters in the
    // plan) is what the row-group stats answer; values are hash-checked.
    "q_sorted_scan" -> { (s, d) =>
      val dir = scratch(d, "sorted")
      // rewritten every run (like q_partition_prune): a bare existence
      // sentinel would serve a stale sorted copy if the source data were
      // regenerated in place — the defect class ensureBucketed's
      // fingerprint exists to prevent
      Tables.orders(s, d)
        .repartitionByRange(4, col("o_orderdate"))
        .sortWithinPartitions(col("o_orderdate"))
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"), QUtil.moneySum(col("o_totalprice"), 2).as("total"))
        .orderBy(col("day"))
    },

    // B5 z-order clustered layout → two-dimension stats-pruned scan: the
    // fourth layout recipe (after directory partitioning, bucketing, and
    // single-key sort). lineitem is rewritten clustered by the Morton
    // interleave of (l_partkey, l_suppkey); the read then filters BOTH keys
    // — pushed to the parquet scan, answered mostly from row-group footer
    // stats because z-locality keeps each row group tight in both
    // dimensions (ZOrderSpec measures the file-level pruning vs the
    // single-key sort, which clusters only one dimension). Values are
    // hash-checked against the unclustered table — layout must never
    // change query results.
    "q_zorder_prune" -> { (s, d) =>
      val dir = scratch(d, "zorder")
      ZOrder.cluster(Tables.lineitem(s, d),
          col("l_partkey"), col("l_suppkey"), numFiles = 8)
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .filter(col("l_partkey").between(100, 299) &&
          col("l_suppkey").between(10, 29))
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy(col("flag"))
    },

    // B114 small-files COMPACTION — [[graft.operators.Compact]] (plan from
    // the FS-API layout, distributed repartition rewrite; full posture on
    // the operator): a deliberately fragmented 64-file copy of documents
    // is compacted to ceil(bytes/256KB) files, and the entry returns the
    // compacted table's CONTENT (ids + payload md5) — the oracle states
    // the result-transparency contract (the bloom-gate convention): a
    // compaction that drops, duplicates, or corrupts one row breaks the
    // hash. File-count/size/idempotence claims are CompactSpec's, since
    // layout is invisible to SQL by design.
    "q_maint_compact" -> { (s, d) =>
      val frag = scratch(d, "frag")
      val comp = scratch(d, "compact")
      Tables.documents(s, d).repartition(64)
        .write.mode("overwrite").parquet(frag)
      graft.operators.Compact.compact(s, frag, comp, targetBytes = 256 * 1024)
      s.read.parquet(comp)
        .select(col("doc_id"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    },

    // B126 PARTITION-PRESERVING compaction —
    // [[graft.operators.Compact.compactPartitioned]] (per-leaf rewrite,
    // layout preserved; posture on the operator): a fragmented
    // source=…-partitioned copy of documents (8 files per partition) is
    // compacted per partition, and the entry returns the compacted
    // table's content READ THROUGH the hive layout with a partition
    // filter — so the hash breaks if the rewrite loses a row, corrupts a
    // payload, OR destroys the key=value tree the pruned read depends
    // on. Per-partition file-count/idempotence claims are CompactSpec's.
    "q_maint_compact_part" -> { (s, d) =>
      val frag = scratch(d, "fragpart")
      val comp = scratch(d, "compactpart")
      Tables.documents(s, d).repartition(8)
        .write.mode("overwrite").partitionBy("source").parquet(frag)
      graft.operators.Compact.compactPartitioned(s, frag, comp,
        targetBytes = 256 * 1024)
      s.read.parquet(comp)
        .filter(col("source") > "src1")
        .select(col("doc_id"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    },

    // B136 FILE-LEVEL zone-map skipping — [[graft.operators.ZoneMap]]
    // (O(files) stats table, loud staleness, residual filter; full posture
    // on the operator): lineitem is written range-clustered on l_orderkey
    // (16 repartitionByRange files — the layout a maintenance pass
    // produces), a zone map is built in one pass, and a narrow range scan
    // is answered through it. The entry returns the scan's AGGREGATED
    // CONTENT — the oracle is the plain filtered table, so pruning that
    // drops or double-counts one file breaks the hash; the
    // files-opened < files-total claim is ZoneMapSpec's (layout is
    // invisible to SQL by design, the Compact convention).
    "q_maint_zonemap" -> { (s, d) =>
      val dir = scratch(d, "zonemap")
      Tables.lineitem(s, d)
        .repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"))
        .write.mode("overwrite").parquet(dir)
      graft.operators.ZoneMap.build(s, dir, "l_orderkey")
      val (df, _) = graft.operators.ZoneMap.read(s, dir, "l_orderkey",
        lo = 1000L, hi = 2999L)
      df.groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy(col("flag"))
    },

    // B136 × B58 — zone map over a Z-ORDERED layout: multi-key stats prune
    // on the CONJUNCTION of two ranges, which is the reason Z-order exists
    // (a single sort key clusters one dimension; the z-interleave keeps
    // every file tight in both, so the two-range predicate skips at file
    // level from the O(files) stats table alone — the metadata layer above
    // q_zorder_prune's parquet row-group pruning). Same transparency
    // contract: the oracle is the plain two-predicate table; pruning
    // sharpness is ZoneMapSpec's measured claim.
    "q_maint_zonemap_zorder" -> { (s, d) =>
      val dir = scratch(d, "zonemapz")
      ZOrder.cluster(Tables.lineitem(s, d),
          col("l_partkey"), col("l_suppkey"), numFiles = 16)
        .write.mode("overwrite").parquet(dir)
      graft.operators.ZoneMap.build(s, dir, Seq("l_partkey", "l_suppkey"))
      val (df, _) = graft.operators.ZoneMap.read(s, dir,
        Seq(("l_partkey", 100L, 299L), ("l_suppkey", 10L, 29L)))
      df.groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy(col("flag"))
    },

    // B137 DELETION VECTORS — [[graft.operators.DeleteVectors]]
    // (merge-on-read row deletes + deferred materialize; full posture on
    // the operator): documents fragmented to 16 files, doc_id % 7 = 3
    // marked deleted (data files untouched — a metadata-only write), then
    // BOTH read paths are returned under one hash: stage 1 = the
    // merge-on-read scan through the DV, stage 2 = the same table after
    // materialize (touched files rewritten, rest byte-copied, DV gone).
    // The oracle states the semantics both stages must share — the plain
    // anti-filtered table, twice. File-level claims (byte-identical data
    // files after mark, rewrite ∝ touched files) are DeleteVectorsSpec's.
    "q_maint_delete_vectors" -> { (s, d) =>
      val dir = scratch(d, "dvsrc")
      val mat = scratch(d, "dvmat")
      Tables.documents(s, d).repartition(16)
        .write.mode("overwrite").parquet(dir)
      val keys = Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 3).select(col("doc_id"))
      graft.operators.DeleteVectors.mark(s, dir, keys, "doc_id")
      val onRead = graft.operators.DeleteVectors.read(s, dir, "doc_id")
        .select(lit(1).as("stage"), col("doc_id"), col("source"),
          col("n_chars"), md5(col("text")).as("text_md5"))
      graft.operators.DeleteVectors.materialize(s, dir, mat, "doc_id")
      val matRead = s.read.parquet(mat)
        .select(lit(2).as("stage"), col("doc_id"), col("source"),
          col("n_chars"), md5(col("text")).as("text_md5"))
      onRead.unionByName(matRead).orderBy(col("stage"), col("doc_id"))
    },

    // B38 xxhash64 + monotonically_increasing_id + input_file_name, shaped
    // so the OUTPUT is deterministic: hashes/ids are compared by cardinality
    // (injective on this data), the file name by its table token.
    "q_misc_ids" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          xxhash64(col("c_name")).as("xxh"),
          monotonically_increasing_id().as("mid"),
          regexp_extract(input_file_name(), "([a-z]+)\\.parquet", 1).as("file_token"))
        .groupBy(col("file_token"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("xxh")).as("n_distinct_xxh"),
          (countDistinct(col("mid")) === count(lit(1))).as("ids_unique"))
        .orderBy(col("file_token"))
    })

  val oracle: Map[String, String] = Map(
    "q_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // compaction is content-transparent: the rewritten table must read
    // back as EXACTLY the source rows, payload included
    "q_maint_compact" ->
      """SELECT doc_id, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // partitioned compaction: content-transparent AND layout-preserving —
    // the entry reads through the rewritten hive tree with a partition
    // filter, so a flattened layout or lost partition breaks the hash
    "q_maint_compact_part" ->
      """SELECT doc_id, source, n_chars, md5(text) AS text_md5
        |FROM documents WHERE source > 'src1' ORDER BY doc_id""".stripMargin,

    // zone-map pruning is an optimization, never semantics: the pruned
    // range scan must equal the plain filtered table
    "q_maint_zonemap" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2999
        |GROUP BY l_returnflag ORDER BY flag""".stripMargin,

    // two-dimensional zone-map pruning is still never semantics: the
    // conjunctive range scan must equal the plain two-predicate table
    "q_maint_zonemap_zorder" ->
      """SELECT l_returnflag AS flag, count(*) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 299 AND l_suppkey BETWEEN 10 AND 29
        |GROUP BY l_returnflag ORDER BY flag""".stripMargin,

    // both delete paths — merge-on-read through the DV and the
    // materialized rewrite — must read as the same anti-filtered table
    "q_maint_delete_vectors" ->
      """SELECT CAST(1 AS INT) AS stage, doc_id, source, n_chars,
        |  md5(text) AS text_md5
        |FROM documents WHERE doc_id % 7 <> 3
        |UNION ALL
        |SELECT CAST(2 AS INT), doc_id, source, n_chars, md5(text)
        |FROM documents WHERE doc_id % 7 <> 3
        |ORDER BY stage, doc_id""".stripMargin,

    "q_schema_merge" ->
      s"""SELECT CAST(1 AS INT) AS b, 'pre_schema' AS status, count(*) AS n,
         |  ${QUtil.moneySumSql("o_totalprice", 2)} AS total
         |FROM orders WHERE o_orderkey < 100
         |UNION ALL
         |SELECT CAST(2 AS INT), o_orderstatus, count(*),
         |  ${QUtil.moneySumSql("o_totalprice", 2)}
         |FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 300
         |GROUP BY o_orderstatus
         |ORDER BY b, status""".stripMargin,

    "q_csv_permissive" ->
      """SELECT FALSE AS is_corrupt, count(*) AS n, count(*) AS n_keys,
        |  min(n_nationkey) AS min_k, max(n_nationkey) AS max_k FROM nation
        |UNION ALL
        |SELECT TRUE, count(*), 0, NULL, NULL FROM nation
        |WHERE n_nationkey % 5 = 0
        |ORDER BY is_corrupt""".stripMargin,

    "q_json_roundtrip" ->
      s"""SELECT o_orderstatus, count(*) AS n,
         |  ${QUtil.moneySumSql("o_totalprice", 2)} AS total,
         |  max(CAST(o_orderdate AS DATE)) AS last_date
         |FROM orders WHERE o_orderkey < 200
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_text_roundtrip" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sorted_scan" ->
      s"""SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
         |  ${QUtil.moneySumSql("o_totalprice", 2)} AS total
         |FROM orders
         |WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY 1 ORDER BY day""".stripMargin,

    "q_orc_roundtrip" ->
      s"""SELECT s_nationkey, count(*) AS n,
         |  ${QUtil.moneySumSql("s_acctbal", 2)} AS total_bal
         |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // avro round-trip is content-transparent: the aggregate over the
    // read-back rows must equal the same aggregate over the source table
    "q_avro_roundtrip" ->
      s"""SELECT s_nationkey, count(*) AS n,
         |  CAST(max(length(s_name)) AS INT) AS max_name_len,
         |  ${QUtil.moneySumSql("s_acctbal", 2)} AS total_bal,
         |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum
         |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    "q_binaryfile_scan" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "q_join_right" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_big_orders,
        |  count(*) AS n_rows
        |FROM (SELECT * FROM orders WHERE o_totalprice > 150000) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_dpp_join" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n,
         |  ${QUtil.moneySumSql("o_totalprice", 2)} AS total
         |FROM orders WHERE year(o_orderdate) >= 1999
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_partition_prune" ->
      s"""SELECT CAST(month(o_orderdate) AS INT) AS mo, count(*) AS n,
         |  ${QUtil.moneySumSql("o_totalprice", 2)} AS total
         |FROM orders WHERE year(o_orderdate) = 1997
         |GROUP BY 1 ORDER BY mo""".stripMargin,

    "q_bucket_join" ->
      """SELECT o_orderstatus, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_misc_ids" ->
      """SELECT 'customer' AS file_token, count(*) AS n_rows,
        |  CAST(count(DISTINCT c_name) AS BIGINT) AS n_distinct_xxh,
        |  TRUE AS ids_unique
        |FROM customer""".stripMargin,

    "q_zorder_prune" ->
      """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 299 AND l_suppkey BETWEEN 10 AND 29
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
