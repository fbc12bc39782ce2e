package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata, never decoded inside
  * the relational plan. Decode / feature-extraction runs as a batched
  * `mapPartitions` stage over the typed Dataset — the Scala analogue
  * of a vectorized Python `mapInPandas` stage: one iterator per
  * partition, library handles per-record work, output is a typed
  * schema Catalyst can keep optimizing after.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * environment): [[FakeCodec]] is a deterministic stand-in with the
  * same signature a real decoder would have. The Spark-side plumbing —
  * schema, partitioning, batch iteration, feature schema — is real and
  * oracle-tested via [[mediaStats]].
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  final case class MediaRecord(id: Long, media: Array[Byte], mime: String, meta: Map[String, String])

  /** Extracted features: what a decode+embed stage would emit. */
  final case class MediaFeatures(
      id: Long, byteLen: Int, width: Int, height: Int, features: Array[Float])

  /** === STUB ===
    * Deterministic fake decoder standing in for an image/audio codec
    * (`???` boundary: replace body with e.g. javax.imageio / ffmpeg
    * bindings in a real deployment — signature stays identical).
    * "Dimensions" are derived from payload length, "features" are a
    * fixed-size byte histogram — deterministic, so tests can assert
    * exact values end-to-end through the mapPartitions plumbing.
    */
  object FakeCodec {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = math.max(1, n % 1024)
      val height = math.max(1, (n / 1024) + 1)
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < n) { hist((payload(i) & 0xff) % FeatureDim) += 1f; i += 1 }
      if (n > 0) { var j = 0; while (j < FeatureDim) { hist(j) /= n; j += 1 } }
      (width, height, hist)
    }
  }

  /** Wrap a text table as media records (payload = UTF-8 bytes) — the
    * fixture path for environments with no real media files.
    */
  def asMediaRecords(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("media"),
      lit("text/plain").as("mime"),
      map(lit("origin"), col(textCol).substr(1, 8)).as("meta"))
      .as[MediaRecord]
  }

  /** Batched decode stage: one partition = one iterator, records
    * processed streaming (no per-partition materialization), output
    * typed. This is the stage shape that scales: decode parallelism ==
    * partition count, no driver involvement, constant memory.
    */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = FakeCodec.decode(r.media)
        MediaFeatures(r.id, r.media.length, w, h, f)
      }
    }
  }

  /** Relational stats over the binary column — stays in the codegen'd
    * plan (no decode): byte length, digest, first-byte. Oracle-checked
    * (DuckDB md5 is VARCHAR-only, so the digest is computed over the
    * identical UTF-8 bytes on both sides).
    */
  def mediaStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(textCol).cast("binary")).cast("long").as("byte_len"),
      md5(col(textCol).cast("binary")).as("digest"),
      ascii(col(textCol).substr(1, 1)).cast("long").as("first_byte"))
}
