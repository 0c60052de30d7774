package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads modeled as opaque
  * `binary` columns with a typed metadata struct, processed partition-wise.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[fakeDecode]] derives deterministic pseudo-features from the
  * bytes themselves, so the Spark-side contract — schema, partitioning, batch
  * shape, null handling — is real and testable, and a production decoder
  * (JavaCPP/FFmpeg or a vectorized JNI batch kernel) drops into the same
  * `mapPartitions` slot.
  *
  * Scale notes: decode is the CPU hot spot at 100 TB, so it runs inside
  * `mapPartitions` (one setup per partition, streaming iterator, no
  * per-row driver round-trips), and payload columns should be pruned until
  * the decode stage — keep metadata in separate columns so scans that only
  * need metadata never read the blobs.
  */
object Multimodal {

  case class MediaMeta(byteLen: Long, contentHash: String, kind: String)
  case class DecodedFeatures(id: Long, byteLen: Long, width: Int, height: Int,
                             channels: Int, meanLuma: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byteLen", LongType, nullable = false),
      StructField("contentHash", StringType, nullable = false),
      StructField("kind", StringType, nullable = false))), nullable = false)))

  /** Wrap any (id, string) source as a media table: payload = utf-8 bytes,
    * metadata computed without touching the payload downstream. */
  def asMediaTable(df: DataFrame, idCol: String, contentCol: String,
                   kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(contentCol), "utf-8").as("payload"),
      struct(
        octet_length(encode(col(contentCol), "utf-8")).cast("long").as("byteLen"),
        md5(col(contentCol)).as("contentHash"),
        lit(kind).as("kind")).as("meta"))

  /** Deterministic stand-in for a real media decoder: derives width/height/
    * channels/meanLuma from the payload bytes. Replace the body with a real
    * decoder; the partition-wise batch contract stays identical. */
  def fakeDecode(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens here (decoder init, buffers, …)
        rows.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val len = bytes.length.toLong
          // ??? — real decode goes here; deterministic fake below
          val w = 16 + (math.abs(java.util.Arrays.hashCode(bytes)) % 240)
          val h = 16 + (math.abs(java.util.Arrays.hashCode(bytes) / 7) % 240)
          val luma = if (len == 0) 0.0
            else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / len
          DecodedFeatures(id, len, w, h, 3, luma)
        }
      }
  }

  /** Metadata-only projection — verifies that blob columns are pruned from
    * the scan when only metadata is requested (check ReadSchema in explain).
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("id"), col("meta.byteLen").as("byte_len"),
      col("meta.contentHash").as("content_hash"), col("meta.kind").as("kind"))
}
