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

  /** Extracted feature vector (a decoder would emit e.g. CLIP embeddings).
    * STUB: deterministic 8-dim histogram of byte value buckets — the real
    * contract is the shape: bytes in, fixed-width Array[Float] out, batch
    * iteration, no shuffle. */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  def fakeFeatures(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    MediaFeatures(docId, hist.map(_ / n))
  }

  def featureExtractBatch(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => fakeFeatures(id, b) })
  }

  /** Resize: a real decoder would decode→scale→re-encode; the STUB keeps
    * the byte-in/byte-out contract with a deterministic downsample (every
    * k-th byte) plus the target dimensions in metadata. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  def fakeResize(docId: Long, bytes: Array[Byte], w: Int, h: Int): ResizedMedia = {
    val stride = math.max(1, bytes.length / math.max(1, w * h))
    ResizedMedia(docId, w, h, bytes.indices.by(stride).map(bytes).toArray)
  }

  def resizeBatch(df: DataFrame, w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => fakeResize(id, b, w, h) })
  }

  /** Frame sampling: a video payload yields N frames (1 row → N rows, the
    * generator shape). STUB frames are deterministic byte slices. */
  case class MediaFrame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  def frameSampleBatch(df: DataFrame, nFrames: Int): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val len = math.max(1, b.length / math.max(1, nFrames))
        (0 until math.min(nFrames, math.max(1, b.length / len))).map { f =>
          MediaFrame(id, f, b.slice(f * len, math.min(b.length, (f + 1) * len)))
        }
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
