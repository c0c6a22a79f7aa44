package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches (the Scala analogue of mapInPandas batch UDFs).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[Multimodal.FakeCodec]] derives deterministic metadata
  * from the raw bytes. The Spark-side plumbing — binary schema, batch
  * iteration, partition parallelism, typed output — is real and tested,
  * and the codec is INJECTED: every batch operator takes a [[MediaCodec]]
  * (default = the stub), so a production deployment swaps in a real
  * javax.imageio / ffmpeg-binding codec at the call site without editing
  * this file. `MediaCodec.open()` runs once per partition — that is where
  * a real codec allocates its native decoder context (once per batch of
  * thousands of payloads, never per record).
  */
object Multimodal {

  /** Per-partition decoder handle — the production decode contract. All
    * methods are record-level; allocation-heavy setup belongs in
    * [[MediaCodec.open]]. */
  trait MediaDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta
    def features(docId: Long, bytes: Array[Byte]): MediaFeatures
    def resize(docId: Long, bytes: Array[Byte], w: Int, h: Int): ResizedMedia
    def frames(docId: Long, bytes: Array[Byte], nFrames: Int): Iterator[MediaFrame]
  }

  /** Injected codec factory: shipped to executors (Serializable), opened
    * ONCE per partition. Swap [[FakeCodec]] for a real implementation in
    * production — the operators below never change. */
  trait MediaCodec extends Serializable {
    def open(): MediaDecoder
  }

  /** Default stub codec — deterministic fakes over raw bytes (no media
    * libraries in this environment); see the per-method docs on the
    * `fake*` functions it delegates to. */
  object FakeCodec extends MediaCodec {
    def open(): MediaDecoder = new MediaDecoder {
      def decode(id: Long, b: Array[Byte]): MediaMeta = fakeDecode(id, b)
      def features(id: Long, b: Array[Byte]): MediaFeatures = fakeFeatures(id, b)
      def resize(id: Long, b: Array[Byte], w: Int, h: Int): ResizedMedia =
        fakeResize(id, b, w, h)
      def frames(id: Long, b: Array[Byte], n: Int): Iterator[MediaFrame] =
        fakeFrames(id, b, n)
    }
  }

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
  def decodeBatch(df: DataFrame,
      codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = codec.open() // decoder context: once per partition
        it.map { case (id, bytes) => dec.decode(id, bytes) }
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

  def featureExtractBatch(df: DataFrame,
      codec: MediaCodec = FakeCodec): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = codec.open()
        it.map { case (id, b) => dec.features(id, b) }
      }
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

  def resizeBatch(df: DataFrame, w: Int, h: Int,
      codec: MediaCodec = FakeCodec): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = codec.open()
        it.map { case (id, b) => dec.resize(id, b, w, h) }
      }
  }

  /** Frame sampling: a video payload yields N frames (1 row → N rows, the
    * generator shape). STUB frames are deterministic byte slices. */
  case class MediaFrame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** STUB frame sampler — deterministic contiguous byte slices: frame
    * length is len/n floored (min 1), frame count clamped so the last
    * slice never starts past the payload. The standalone definition (like
    * the other `fake*` stubs) is the single place the stub contract
    * lives; [[FakeCodec]] delegates to it. */
  def fakeFrames(docId: Long, bytes: Array[Byte], nFrames: Int): Iterator[MediaFrame] = {
    val len = math.max(1, bytes.length / math.max(1, nFrames))
    (0 until math.min(nFrames, math.max(1, bytes.length / len))).iterator.map { f =>
      MediaFrame(docId, f,
        bytes.slice(f * len, math.min(bytes.length, (f + 1) * len)))
    }
  }

  def frameSampleBatch(df: DataFrame, nFrames: Int,
      codec: MediaCodec = FakeCodec): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = codec.open()
        it.flatMap { case (id, b) => dec.frames(id, b, nFrames) }
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
