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

  /** Storage GC planner: how much of the media store is no longer
    * referenced — the blob-side counterpart of
    * [[graft.sources.TableStore]]'s vacuum. After curation drops
    * documents, their payloads survive in the media table until someone
    * measures them; this audit says whether a physical GC pass is worth
    * scheduling. One summary row: n_media, n_orphans, bytes_total,
    * bytes_orphaned, orphan_bytes_share (6 dp, 0 when the store is
    * empty).
    *
    * Scale shape: the reference set reduces to distinct ids (one
    * hash-agg), the probe is a single id-keyed left join — the media
    * table's PAYLOAD column is never read (only `meta.byteLen`), so the
    * scan prunes the blobs; the final reduce is a partial-agg over one
    * tiny row per task. */
  def orphanAudit(media: DataFrame, refs: DataFrame, refIdCol: String): DataFrame = {
    val r = refs.select(col(refIdCol).cast("long").as("__ref_id")).distinct()
    media.select(col("id"), col("meta.byteLen").as("__bytes"))
      .join(r, col("id") === col("__ref_id"), "left")
      .agg(
        count(lit(1)).as("n_media"),
        count(when(col("__ref_id").isNull, 1)).as("n_orphans"),
        coalesce(sum("__bytes"), lit(0L)).as("bytes_total"),
        coalesce(sum(when(col("__ref_id").isNull, col("__bytes"))), lit(0L))
          .as("bytes_orphaned"))
      .select(col("n_media"), col("n_orphans"), col("bytes_total"),
        col("bytes_orphaned"),
        when(col("bytes_total") === 0L, lit(0.0))
          .otherwise(round(col("bytes_orphaned").cast("double") /
            col("bytes_total"), 6)).as("orphan_bytes_share"))
  }

  /** Deterministic stand-in for a real media decoder: derives width/height/
    * meanLuma from the md5 of the payload bytes, so the fake features are
    * reproducible by ANY engine with md5 + nibble arithmetic (the DuckDB
    * oracle recomputes them exactly — see SparkEntry q32). Replace the body
    * with a real decoder; the partition-wise batch contract stays identical. */
  def fakeDecode(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup happens here (decoder init, buffers, …)
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val len = bytes.length.toLong
          // ??? — real decode goes here; md5-derived deterministic fake below
          md.reset()
          val h = md.digest(bytes)
          // nibble k of the hex digest, as an integer 0-15
          def nib(k: Int): Long = {
            val b = h(k / 2) & 0xff
            if (k % 2 == 0) (b >> 4).toLong else (b & 0xf).toLong
          }
          def nibs(from: Int, n: Int): Long =
            (from until from + n).foldLeft(0L)((a, k) => a * 16 + nib(k))
          val w = 16 + (nibs(0, 4) % 240).toInt
          val ht = 16 + (nibs(4, 4) % 240).toInt
          // 32-bit value / 2^32: exact in double on every engine
          val luma = nibs(8, 8).toDouble / 4294967296.0
          DecodedFeatures(id, len, w, ht, 3, luma)
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
