package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches (the Scala analogue of mapInPandas batch UDFs).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): `fakeDecode` derives deterministic metadata from the raw
  * bytes. The Spark-side plumbing — binary schema, batch iteration,
  * partition parallelism, typed output — is real and tested; swap
  * `fakeDecode` for a real codec (e.g. javax.imageio / ffmpeg bindings) in
  * production.
  */
object Multimodal {

  /** Typed metadata a decoder would produce. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, channels: Int)

  /** STUB decoder — deterministic fake: derives pseudo-dimensions from byte
    * content. Replace with a real codec; the signature (bytes in, typed
    * meta out) is the production contract. */
  def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val first = if (n > 0) bytes(0) & 0xff else 0
    val last = if (n > 0) bytes(n - 1) & 0xff else 0
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      format = if (first % 2 == 0) "img/fake-rgb" else "img/fake-gray",
      width = 64 + (first % 64),
      height = 64 + (last % 64),
      channels = if (first % 2 == 0) 3 else 1)
  }

  /** Batch decode over a binary column: partition-local, no shuffle, no
    * driver involvement — the shape a 100 TB media pipeline needs. Input
    * must have (doc_id long, payload binary). */
  def decodeBatch(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init is where a real codec would allocate its
        // decoder context once per batch rather than per record
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Oracle-checkable restatement over documents: byte metadata of the
    * text payload treated as an opaque blob (pure expressions, no stub). */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    EventOps.tbl(spark, dir, "documents").select(
      col("doc_id"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      ascii(col("text")).cast("long").as("first_byte"),
      (octet_length(col("text")) % 3 + 1).cast("long").as("fake_channels"))

  /** The documents table with a synthetic binary payload column — the
    * multimodal carrier used by specs to exercise decodeBatch. */
  def withPayload(spark: SparkSession, dir: String): DataFrame =
    EventOps.tbl(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
}
