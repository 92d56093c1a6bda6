package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling (SURVEY.md §2 B53): image/audio/video payloads
  * ride through the engine as opaque `binary` columns with typed metadata;
  * decode/feature-extraction runs as a typed `mapPartitions` over the bytes
  * — the Spark plumbing (schema, batching, partition-parallel execution) is
  * real, while the codec itself is STUBBED behind [[Decoder]]: real image or
  * audio libraries are not available in this environment, so the default
  * decoder computes deterministic byte-level features. Swapping in a real
  * codec is a one-line constructor change, not a pipeline change.
  *
  * Scale posture: mapPartitions keeps the decode inside the scan stage (no
  * shuffle, no driver collect); one output row per input row, constant-size
  * features, so the stage is embarrassingly parallel at any data size.
  */
object Multimodal {

  /** Per-payload features; the `Decoder` contract. */
  case class Features(
      doc_id: Long, n_bytes: Int, mean_byte: Double, max_byte: Int, checksum: Long)

  /** Pluggable codec: bytes → (n_bytes, mean_byte, max_byte, checksum). */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): Features
  }

  /** The deterministic stub codec (see class doc): byte statistics + a
    * 31-ary rolling checksum mod 1e9+7 seeded at 1. */
  object StubDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): Features = {
      var sum = 0L
      var mx = 0
      var ck = 1L
      var i = 0
      while (i < bytes.length) {
        val u = bytes(i) & 0xff
        sum += u
        if (u > mx) mx = u
        ck = (ck * 31 + u) % 1000000007L
        i += 1
      }
      val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
      Features(id, bytes.length, mean, mx, ck)
    }
  }

  /** Decode features for `(doc_id: long, content: binary)` rows. */
  def features(spark: SparkSession, bin: DataFrame,
               decoder: Decoder = StubDecoder): DataFrame = {
    import spark.implicits._
    bin.selectExpr("doc_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder.decode(id, bytes) })
      .toDF()
  }
}
