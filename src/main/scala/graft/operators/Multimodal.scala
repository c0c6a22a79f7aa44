package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    /** [[Multimodal.PerceptualDims]]-dim perceptual descriptor — the pHash
      * input. A real image codec decodes, grayscales, and downsamples to an
      * 8×8 grid of mean luma (that decode+resample is what buys pHash its
      * re-encode/scale robustness); the stub emits the byte-blob analogue
      * (see [[Multimodal.fakePerceptual]]). Values must be non-negative and
      * integer-valued floats below 2^24 so the engine can recover exact
      * integers for oracle-replayable arithmetic. */
    def perceptual(docId: Long, bytes: Array[Byte]): Array[Float]
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
      def perceptual(id: Long, b: Array[Byte]): Array[Float] =
        fakePerceptual(id, b)
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

  /** Upper payload bound for the stub histogram's EXACT-recovery contract
    * (see [[mmFeatures]]): the oracle recovers integer counts as
    * round(feature·n), whose float round-trip error stays under the 0.5
    * rounding radius only while n stays well below 2²³ — 4 MiB keeps a
    * 2× safety margin. Enforced, not assumed: a payload past the bound
    * fails loudly here instead of hash-mismatching in the oracle. */
  val FeatureExactMaxBytes: Int = 1 << 22

  def fakeFeatures(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    require(bytes.length < FeatureExactMaxBytes,
      s"doc $docId: ${bytes.length} B payload exceeds the " +
        s"$FeatureExactMaxBytes B exact-recovery bound of the stub histogram")
    // integer accumulation: a Float `+= 1f` counter silently stops
    // incrementing past 2²⁴ — convert to Float only at normalization
    val hist = new Array[Int](8)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 5) += 1; i += 1 }
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

  // ---------------------------------------------------------------------
  // Perceptual near-dup: pHash-style signature over the codec's perceptual
  // descriptor, SimHash-band candidate join, exact integer-L1 verify.
  // ---------------------------------------------------------------------

  /** Perceptual descriptor width (pHash's 8×8 grid). Round 10 MEASURED
    * the "finer cells" alternative (128 cells / 8 bands) and rejected
    * it: finer cells double a true near-dup pair's absolute Hamming
    * distance while the pigeonhole-exact radius only grows 3 → 7, so
    * real near-dup pairs fell out of every band — mm_near_dup returned
    * 0 rows on the sf0.001 fixture. The descriptor SEMANTICS therefore
    * stay at 64 cells; the round-11 widening happens in the derived
    * SIGNATURE instead (see [[PerceptualBits]]). */
  val PerceptualDims = 64
  /** Signature geometry: [[PerceptualBits]] sign-PROJECTION bits over the
    * cell-deviation vector, banded [[PerceptualBands]] ×
    * [[PerceptualBandBits]] → 2²⁴ ≈ 16.8 M buckets per band. Round 10's
    * 4 × 16 layout over threshold-at-mean bits had two structural faults
    * at scale: (a) a fixed 65,536-bucket band space — at 100× data every
    * bucket is hot and the backstop cap deletes recall; (b) the 64
    * threshold bits are heavily CORRELATED across documents (payloads
    * share coarse segment profiles), so the effective key space was far
    * smaller still — the measured 69× candidate growth at 10× data.
    * Sign projections re-randomize every bit uniformly (the round-8
    * text-simhash widening playbook, [[TextOps.simhashParams]]): bit j is
    * the sign of a ±1-weighted sum of the deviation vector
    * (cells·dims − total), so near-identical descriptors still agree on
    * almost every bit (a bit flips with probability θ/π, θ the
    * deviation-vector angle; measured round 11: single-byte payload
    * edits flip ZERO of the 144 bits, a length-changing edit that
    * re-segments every cell still leaves an intact band) while unrelated
    * documents land on independent uniform keys — measured census:
    * sf0.1 5 000 docs → 104 candidates (max bucket 2), sf1 50 000 docs
    * → 8 471 (max bucket 5, ZERO capped buckets; the r10 geometry
    * measured 1.37 M). Residual candidate mass is the banding floor
    * B·n²/2^bandBits — quadratic with an arbitrarily small constant that
    * the parameterized band width controls, so a larger corpus widens
    * bands without a library edit.
    *
    * What this geometry deliberately does NOT chase (round-11
    * measurement, committed in SURVEY §8): the fake codec's qualifying
    * pairs at the 1/16 L1 threshold are profile COINCIDENCES sitting at
    * the p0.1 tail of a continuous distance distribution (sf0.01: 120 of
    * 124 750 pairs ≤ 625 bp, but 37 005 ≤ 2·threshold — no gap). No LSH
    * family separates a gapless tail without quadratic candidate
    * leakage (quantized-profile banding measured 41 M sf1 candidates —
    * 95× growth; the r10 threshold bits caught 4/120 by luck). Real
    * perceptual near-dups (a re-encoded/resized image through a real
    * codec's decode+resample) produce PROPORTIONALLY-similar grids —
    * the angle-near regime where sign projections have the measured
    * ~full recall; the exact answer for gapless-tail mining is the
    * stats-gated Θ(n²) pattern `TextOps.textCosinePairs` implements.
    * The exact-L1 verify is untouched, recall is pigeonhole-exact for
    * signature Hamming ≤ [[PerceptualBands]]−1, and the hot-bucket cap
    * stays as a backstop only. */
  val PerceptualBits = 144
  val PerceptualBands = 6
  val PerceptualBandBits: Int = PerceptualBits / PerceptualBands

  /** Plan-time band-width selection (round-11 VERDICT item 5) — the
    * df-cap idiom applied to the banding floor: the expected random-
    * collision candidate mass of a `bands`-band geometry over n docs is
    * bands·n²/2^bandBits, so pick the SMALLEST band width keeping it at
    * or under `candidatesPerDoc`·n, i.e.
    * bandBits = ⌈log₂(bands·n / candidatesPerDoc)⌉. Floored at the
    * default [[PerceptualBandBits]] (narrower bands than the default
    * buy nothing — every corpus up to ~2.8 M docs, including every
    * oracle/test scale, keeps the EXACT default 144-bit geometry, which
    * is what keeps the rendered DuckDB oracle in sync), and capped at
    * 62 so band keys stay positive int64s. At n = 10⁸ this widens to
    * 30-bit bands (180-bit signatures) — candidate mass stays ≈ n/2
    * instead of exploding to 3.4 × 10⁷·n, with no library edit, the
    * scaling the round-11 geometry documented as "parameterized" now
    * chosen by the plan itself. MultimodalSpec pins the chosen widths
    * at 10⁴/10⁶/10⁸. */
  /** Largest corpus for which [[autoBandBits]] keeps the DEFAULT
    * geometry (6·n ≤ 2²⁴ → n ≤ 2 796 202). The rendered DuckDB oracles
    * (SparkEntry.mmNearDupSql and its twins) compute band_bits FROM THE
    * CORPUS COUNT with the same formula (round-13, closing the r12 §8
    * residual), so they stay valid past this bound; the
    * `mm_near_dup_widened` row pins the widened regime with a simulated
    * count ([[WidenedOracleSimDocs]]). [[perceptualNearDupOf]] still
    * logs when a corpus crosses the bound — the remaining caveat is a
    * caller-passed `nDocs` override that differs from the true count
    * the oracle's count(*) sees. */
  val DefaultGeometryMaxDocs: Long = (1L << PerceptualBandBits) / PerceptualBands

  /** Hard band-width ceiling of [[autoBandBits]] (keys must stay positive
    * int64s). Also sizes the rendered oracle's projection-params VALUES
    * list: [[perceptualParams]] is PREFIX-STABLE (params for bit j are a
    * pure function of j alone), so a list rendered at
    * MaxAutoBandBits·[[PerceptualBands]] bits is valid for EVERY
    * geometry autoBandBits can choose — the SQL restricts to the first
    * band_bits·bands entries at evaluation time. */
  val MaxAutoBandBits: Int = 62

  /** Simulated corpus count for the `mm_near_dup_widened` oracle row:
    * just past [[DefaultGeometryMaxDocs]] (≈2.8 M), where autoBandBits
    * first leaves the default geometry (→ 25-bit bands, 150-bit
    * signatures). Both the Spark query (via `nDocs = Some(...)`) and the
    * rendered SQL (via the same formula over this literal) derive the
    * widened geometry from this ONE constant, so the oracle row proves
    * the auto-widened path end-to-end without materializing 3 M docs. */
  val WidenedOracleSimDocs: Long = 3L * 1000 * 1000

  def autoBandBits(nDocs: Long, bands: Int = PerceptualBands,
      candidatesPerDoc: Double = 1.0): Int = {
    require(bands > 0 && candidatesPerDoc > 0,
      s"bands=$bands candidatesPerDoc=$candidatesPerDoc must be positive")
    if (nDocs <= 0) PerceptualBandBits
    else {
      val need = math.ceil(
        math.log(bands.toDouble * nDocs / candidatesPerDoc) / math.log(2.0))
        .toInt
      math.min(MaxAutoBandBits, math.max(PerceptualBandBits, need))
    }
  }
  /** Default verify threshold: normalized L1 distance between the two
    * descriptors ≤ 1/16. Dyadic so the cross-multiplied comparison is
    * exact integer math on both engines. */
  val NearDupL1Denom = 16L

  /** STUB perceptual descriptor — the byte-blob analogue of pHash's
    * downsampled luma grid: the payload is split into
    * [[PerceptualDims]] equal segments and each cell is the SUM of the
    * unsigned byte values in its segment (an integer stand-in for "mean
    * luma of the cell"). Content-sensitive and length-normalized; NOT
    * shift-robust — an insertion moves every later byte across segment
    * boundaries. Real pHash buys shift/re-encode robustness from the
    * codec's decode+resample, which is exactly the part this sandbox
    * cannot run; the banding/verify machinery downstream is unchanged
    * by that swap. */
  def fakePerceptual(docId: Long, bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](PerceptualDims)
    val n = bytes.length
    var i = 0
    while (i < n) {
      out(((i.toLong * PerceptualDims) / n).toInt) += (bytes(i) & 0xff)
      i += 1
    }
    out
  }

  /** Integer perceptual descriptor + banded sign-projection signature,
    * one codec pass. Cells are recovered as exact integers from the
    * codec's float descriptor (`round` — exact while values stay below
    * 2^24, which the decoder contract requires); `total` is their sum
    * and `bkeys(b)` is band b's [[PerceptualBandBits]]-bit key of the
    * [[perceptualBandKeys]] signature — band keys are stored directly
    * (round-11; the previous packed-word layout made band extraction a
    * word-straddle puzzle the moment band width stopped dividing 64). */
  case class PerceptualDesc(doc_id: Long, total: Long, cells: Array[Long],
      bkeys: Array[Long])

  /** One decoded row per input document — the K2 dead-letter idiom
    * applied to the codec seam: `err == null` rows carry the descriptor,
    * violation rows carry the message (and empty arrays). Exactly one of
    * the two per doc, so `descriptors + quarantine` partitions the
    * corpus. */
  case class PerceptualDecoded(doc_id: Long, total: Long, cells: Array[Long],
      bkeys: Array[Long], err: String)

  /** Projection parameter pairs (a_j, b_j) — the same universal family as
    * [[TextOps.simhashParams]]/[[TextOps.minhashParamsN]], offset so the
    * three signature spaces never share a parameter pair. */
  private[graft] def perceptualParams(n: Int): IndexedSeq[(Long, Long)] =
    (0 until n).map(j => (104729L * (j + 131) % TextOps.MOD,
      15485863L * (j + 97) % TextOps.MOD))

  /** THE signature definition — one pure function shared by the decode
    * pass, the specs, and (via rendered constants) the DuckDB oracle.
    * Bit j of the `nBits`-bit signature is the sign of
    * Σ_k s_jk · (cells(k)·dims − total) with s_jk = ±1 from
    * ((a_j·(k+1) + b_j) mod M)·2 > M (M = [[TextOps.MOD]]); band
    * j / bandBits accumulates bit j at offset j mod bandBits. Integer
    * ranges: |deviation term| < 2^30 by the decoder contract, summed
    * over dims=64 < 2^36 — exact in int64 on both engines. */
  def perceptualBandKeys(cells: Array[Long], nBits: Int = PerceptualBits,
      bands: Int = PerceptualBands): Array[Long] =
    bandKeysWith(cells, signSchedule(nBits, cells.length), nBits, bands)

  /** The ±1 sign schedule as a flat (nBits × dims) matrix — a pure
    * function of the geometry, HOISTED out of the per-document loop by
    * [[perceptualDecoded]] (the Kernels.simhashSig hoisting discipline:
    * recomputing it per row paid nBits×dims modular multiplications per
    * document for a row-invariant value). */
  private[graft] def signSchedule(nBits: Int, dims: Int): Array[Byte] = {
    val params = perceptualParams(nBits)
    val signs = new Array[Byte](nBits * dims)
    var j = 0
    while (j < nBits) {
      val (a, b) = params(j)
      var k = 0
      while (k < dims) {
        val h = (a * (k + 1) + b) % TextOps.MOD
        signs(j * dims + k) = if (2 * h > TextOps.MOD) 1 else -1
        k += 1
      }
      j += 1
    }
    signs
  }

  private def bandKeysWith(cells: Array[Long], signs: Array[Byte],
      nBits: Int, bands: Int): Array[Long] = {
    require(nBits > 0 && bands > 0 && nBits % bands == 0,
      s"bands ($bands) must divide nBits ($nBits)")
    val bandBits = nBits / bands
    require(bandBits <= 62, s"band keys must fit a positive int64 (got $bandBits)")
    val dims = cells.length
    val total = cells.sum
    val dev = Array.tabulate(dims)(k => cells(k) * dims - total)
    val keys = new Array[Long](bands)
    var j = 0
    while (j < nBits) {
      var s = 0L
      var k = 0
      val off = j * dims
      while (k < dims) {
        s += (if (signs(off + k) > 0) dev(k) else -dev(k))
        k += 1
      }
      if (s >= 0) keys(j / bandBits) |= 1L << (j % bandBits)
      j += 1
    }
    keys
  }

  /** Decode the corpus into one [[PerceptualDecoded]] row per document —
    * the single codec pass both [[perceptualDescriptors]] and
    * [[perceptualQuarantine]] are views over (persist this relation when
    * consuming both sides at scale, so the codec runs once). */
  def perceptualDecoded(df: DataFrame,
      codec: MediaCodec = FakeCodec,
      nBits: Int = PerceptualBits,
      bands: Int = PerceptualBands): Dataset[PerceptualDecoded] = {
    val spark = df.sparkSession
    import spark.implicits._
    // row-invariant sign schedule hoisted out of the decode loop (9 KB
    // at the default geometry, shipped in the closure)
    val signs = signSchedule(nBits, PerceptualDims)
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = codec.open()
        it.map { case (id, bytes) =>
          val f = dec.perceptual(id, bytes)
          // enforce the decoder contract instead of trusting it:
          // PerceptualDims cells, each below 2^24 (float round-trip
          // exactness AND the long-safety bound of the verify's
          // cell·total products — 2^24 · Σcells(≤ 2^30) = 2^54 per
          // term, 2^60 summed)
          val cells = if (f.length == PerceptualDims)
            f.map(v => math.round(v.toDouble)) else Array.empty[Long]
          val ok = cells.nonEmpty && cells.forall(c => c >= 0 && c < (1L << 24))
          if (!ok)
            PerceptualDecoded(id, 0L, Array.empty, Array.empty,
              s"perceptual descriptor out of contract for doc $id: " +
                s"${f.length}-dim, cells must be $PerceptualDims × [0, 2^24)")
          else
            PerceptualDecoded(id, cells.sum, cells,
              bandKeysWith(cells, signs, nBits, bands), null)
        }
      }
  }

  /** Decode the corpus into [[PerceptualDesc]]s. `quarantine = false`
    * (default) fails fast on a decoder-contract violation with the doc
    * id in the error — a corrupted CODEC is a deploy problem, not a data
    * problem. `quarantine = true` routes out-of-contract documents to
    * the dead-letter side instead ([[perceptualQuarantine]] lists them),
    * for corpus-scale pipelines where one hostile payload must not abort
    * the job (round-10 VERDICT item 5). */
  def perceptualDescriptors(df: DataFrame,
      codec: MediaCodec = FakeCodec,
      quarantine: Boolean = false,
      nBits: Int = PerceptualBits,
      bands: Int = PerceptualBands): Dataset[PerceptualDesc] = {
    val spark = df.sparkSession
    import spark.implicits._
    perceptualDecoded(df, codec, nBits, bands).flatMap { d =>
      if (d.err == null)
        Iterator.single(PerceptualDesc(d.doc_id, d.total, d.cells, d.bkeys))
      else if (quarantine) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"perceptualDescriptors: quarantined doc ${d.doc_id} " +
            "(decoder-contract violation)")
        Iterator.empty
      } else throw new IllegalArgumentException(d.err)
    }
  }

  /** The dead-letter relation of the codec seam: (doc_id, err), one row
    * per decoder-contract violation — the multimodal analogue of the
    * pipeline's K2 unknown-feature sink. Empty on a clean corpus. */
  def perceptualQuarantine(df: DataFrame,
      codec: MediaCodec = FakeCodec): DataFrame =
    perceptualDecoded(df, codec).toDF()
      .filter(col("err").isNotNull)
      .select(col("doc_id"), col("err"))

  /** Perceptual near-dup pairs over any (doc_id, payload) relation:
    * signatures band-join on [[PerceptualBands]] disjoint
    * [[PerceptualBandBits]]-bit keys (bucket-local equi-join, never
    * all-pairs), then candidates are verified with the exact
    * cross-multiplied L1 on the integer descriptors:
    * `Σ|cellA·totalB − cellB·totalA| · denom ≤ totalA·totalB`
    * ⟺ normalized L1 ≤ 1/denom. Output carries the distance as floored
    * basis points — integer-exact on both engines. */
  def perceptualNearDupOf(df: DataFrame, codec: MediaCodec = FakeCodec,
      l1Denom: Long = NearDupL1Denom, maxBucketSize: Int = 4096,
      isinLimit: Int = 1000, quarantine: Boolean = false,
      nDocs: Option[Long] = None): DataFrame = {
    // eager-job idiom: the banded self-join reads ONE materialization of
    // the codec pass (Catalyst shares no common subplans — an unpersisted
    // relation would run the mapPartitions decode once per join side).
    // Storage medium size-adaptive via Engine.miningLevel.
    // `quarantine = true` mines over the in-contract documents only
    // (violations drop from candidate generation; list them via
    // [[perceptualQuarantine]]) instead of aborting the whole mining job
    // on one hostile payload — the corpus-scale posture.
    val lvl = graft.Engine.miningLevel(df)
    // geometry chosen by the plan from the corpus count (autoBandBits):
    // a narrow count-star job — parquet sources answer it from footer
    // metadata after column pruning, so the default count is cheap for
    // the shipped table-backed paths. A caller whose relation has an
    // EXPENSIVE unpersisted lineage (joins, decoded payloads) should
    // pass `nDocs` explicitly (or persist upstream): the count otherwise
    // executes that lineage once for the census and once for the decode.
    // Every corpus at or below DefaultGeometryMaxDocs (~2.8 M docs)
    // resolves to the default 144-bit geometry; wider corpora widen
    // loudly (warn below). The rendered oracle computes band_bits from
    // its own count(*) with the same formula, so the two sides widen
    // together — the warn marks the regime change, not an oracle break
    // (the one remaining divergence is an nDocs override that differs
    // from the count the oracle sees, which is the caller's contract).
    val bandBits = autoBandBits(nDocs.getOrElse(df.count()))
    if (bandBits != PerceptualBandBits)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"perceptualNearDup: corpus exceeds DefaultGeometryMaxDocs " +
          s"($DefaultGeometryMaxDocs) — auto-widened to $bandBits-bit " +
          "bands (the count-driven DuckDB oracle widens with it)")
    val banded = bandedOf(
        perceptualDescriptors(df, codec, quarantine = quarantine,
          nBits = bandBits * PerceptualBands).toDF())
      .persist(lvl)
    // Hot-bucket cap — the lshNearDupPairs hygiene pattern, and the
    // round-10 answer to the measured quadratic candidate growth at
    // scale (19.8 k → 1.37 M candidates at 10× data: ScaleGen's
    // perturbed copies share coarse segment profiles, so a popular band
    // key squares in the self-join). Buckets over the cap are DROPPED
    // from candidate generation, never silently: the census below logs
    // how many buckets/memberships the cap removed. Members still pair
    // through their other bands unless every shared band is hot.
    val hot = banded.groupBy("band", "bkey")
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") > maxBucketSize)
      .collect()
    if (hot.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"perceptualNearDup: dropped ${hot.length} band bucket(s) over " +
          s"$maxBucketSize members " +
          s"(${hot.map(_.getLong(2)).sum} memberships) from candidates")
    val bandKey = concat_ws("|", col("band"), col("bkey"))
    val kept =
      if (hot.isEmpty) banded
      else if (hot.length <= isinLimit)
        banded.filter(!bandKey.isin(
          hot.map(r => s"${r.getInt(0)}|${r.getLong(1)}").toSeq: _*))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        banded.join(
          broadcast(hot.map(r => (r.getInt(0), r.getLong(1)))
            .toSeq.toDF("band", "bkey")),
          Seq("band", "bkey"), "left_anti")
      }
    val out = graft.Engine.eagerCheckpoint(verifyFromBanded(kept, l1Denom), lvl)
    banded.unpersist(true)
    out
  }

  /** [[perceptualNearDupOf]] on the documents payload table. */
  def perceptualNearDup(spark: SparkSession, dir: String): DataFrame =
    perceptualNearDupOf(withPayload(spark, dir))

  /** Deterministic seed payloads for the NON-VACUOUS oracle twin
    * (round-11 VERDICT item 6 / ADVICE): at the oracle scale factors
    * the documents corpus yields ZERO perceptual pairs, so the plain
    * mm_near_dup oracle row only ever compares empty sets — a
    * sign-convention or parameter-offset divergence between the Spark
    * signature and its SQL replay would pass every gate. These three
    * payloads guarantee answer rows: two IDENTICAL copies (identical
    * band keys under ANY geometry, L1 = 0 — the unconditional row) and
    * a one-byte edit (the angle-near regime: one flipped byte leaves
    * the sign bits intact and an L1 gap ≪ 1/16). Negative doc_ids keep
    * the seeds disjoint from any corpus. The payload must be
    * IRREGULAR text: a short-period pattern (first attempt: "abcdefgh"
    * × 96) makes the deviation vector alternate between two values, the
    * projection sums sit near zero, and a one-byte edit flips bands —
    * the pangram unit's 44-byte period is non-commensurate with the
    * 64-segment grid, which is exactly the payload shape the QueriesSpec
    * band-agreement test pins. The SQL side renders `repeat()`/`rtrim`
    * expressions from these SAME constants
    * (SparkEntry.mmNearDupSeededSql). */
  val SeedUnit = "the quick brown fox jumps over the lazy dog "
  val SeedEditedUnit = "the qujck brown fox jumps over the lazy dog "
  val SeedReps = 20
  def seedPayloads: Seq[(Long, String)] = {
    val base = (SeedUnit * SeedReps).trim
    val edited = (SeedEditedUnit + SeedUnit * (SeedReps - 1)).trim
    Seq((-3L, base), (-2L, base), (-1L, edited))
  }

  /** [[perceptualNearDup]] over documents ∪ [[seedPayloads]] — the
    * oracle-gated variant whose answer is non-empty BY CONSTRUCTION, so
    * the full signature→banding→verify formula is pinned end-to-end by
    * at least three hash-compared rows at every scale factor. */
  def perceptualNearDupSeeded(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seeds = seedPayloads.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    perceptualNearDupOf(withPayload(spark, dir).unionByName(seeds))
  }

  /** [[perceptualNearDupSeeded]] under a SIMULATED corpus count past
    * [[DefaultGeometryMaxDocs]] — the oracle row that keeps
    * [[autoBandBits]]'s auto-widened geometry oracle-valid (round-12
    * VERDICT item 3): `nDocs = Some(`[[WidenedOracleSimDocs]]`)` forces
    * the 25-bit-band / 150-bit-signature geometry a >2.8 M-doc corpus
    * would select, on the real (seeded) corpus the oracle can replay;
    * the rendered SQL computes band_bits FROM THE SAME LITERAL with the
    * same formula (SparkEntry.mmNearDupWidenedSql), so a drift in
    * either side's widening arithmetic hash-mismatches. The seeds
    * guarantee ≥3 answer rows under ANY geometry (identical payloads
    * share every band key). */
  def perceptualNearDupWidened(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seeds = seedPayloads.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    perceptualNearDupOf(withPayload(spark, dir).unionByName(seeds),
      nDocs = Some(WidenedOracleSimDocs))
  }

  /** Un-materialized twin for plan inspection (PlanSpec audits this
    * dataflow; localCheckpoint truncates lineage on the real one). */
  private[graft] def perceptualNearDupLazy(spark: SparkSession,
      dir: String): DataFrame =
    nearDupFromDesc(perceptualDescriptors(withPayload(spark, dir)).toDF(),
      NearDupL1Denom)

  /** Capless composition for plan inspection and small relations. */
  private def nearDupFromDesc(desc: DataFrame, l1Denom: Long): DataFrame =
    verifyFromBanded(bandedOf(desc), l1Denom)

  /** Descriptors exploded onto their band buckets — band keys are stored
    * per band by the decode pass ([[PerceptualDesc.bkeys]]), so this is a
    * plain posexplode: band = array position, key = element. */
  private def bandedOf(desc: DataFrame): DataFrame =
    desc.select(col("doc_id"), col("total"), col("cells"),
      posexplode(col("bkeys")).as(Seq("band", "bkey")))

  /** Bucket self-join + exact integer-L1 verify over a (possibly
    * hot-bucket-filtered) banded relation. */
  private def verifyFromBanded(banded: DataFrame,
      l1Denom: Long): DataFrame = {
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.total").as("total_a"), col("b.total").as("total_b"),
        col("a.cells").as("cells_a"), col("b.cells").as("cells_b"))
      // a pair colliding in several bands appears once
      .dropDuplicates("doc_a", "doc_b")
      // a zero-total payload has no profile to normalize against —
      // excluded on BOTH sides (the oracle carries the same guard), and
      // this also removes the 0/0 basis-point division
      .filter(col("total_a") > 0 && col("total_b") > 0)
      // l1x is long-safe by the enforced decoder contract (≤ 2^60); the
      // DOWNSTREAM products are not (l1x·denom up to 2^64, 10000·l1x up
      // to 2^73 for near-threshold multi-megabyte profiles), so both run
      // in DECIMAL(38,0) — exact integer math, ~2^126 headroom; the
      // returned basis points still fit a BIGINT trivially
      .withColumn("l1x", aggregate(
        zip_with(col("cells_a"), col("cells_b"),
          (x, y) => abs(x * col("total_b") - y * col("total_a"))),
        lit(0L), (acc, v) => acc + v))
      .filter(col("l1x").cast("decimal(38,0)") * lit(l1Denom) <=
        col("total_a").cast("decimal(38,0)") * col("total_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST((10000 * CAST(l1x AS DECIMAL(38,0))) DIV " +
          "(CAST(total_a AS DECIMAL(38,0)) * total_b) AS BIGINT)")
          .as("l1_bp"))
  }

  /** Default frame-sample fan-out for [[mmFrameSample]] — shared with the
    * rendered oracle. */
  val FrameSampleN = 8

  /** Oracle-gated restatement of [[frameSampleBatch]] over the documents
    * payload (round-12; the batch op itself was spec-only): each frame
    * reduced to hash-comparable columns (md5 + length — the frame BYTES
    * are replayed in DuckDB through the ASCII byte=char invariant, same
    * contract as the perceptual oracle). Generator shape: 1 row → up to
    * [[FrameSampleN]] rows, map-only, no shuffle. */
  def mmFrameSample(spark: SparkSession, dir: String,
      nFrames: Int = FrameSampleN): DataFrame =
    frameSampleBatch(withPayload(spark, dir), nFrames).toDF()
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        md5(col("frame")).as("frame_md5"),
        octet_length(col("frame")).cast("long").as("frame_len"))

  /** Default resize grid for [[mmResize]] (pHash's 8×8) — shared with the
    * rendered oracle. */
  val ResizeW = 8
  val ResizeH = 8

  /** Oracle-gated restatement of [[resizeBatch]]: the stub's every-k-th
    * byte downsample reduced to (md5, length) — DuckDB rebuilds the
    * sampled byte string with an ordered string_agg over the stride
    * indices. Map-only. */
  def mmResize(spark: SparkSession, dir: String, w: Int = ResizeW,
      h: Int = ResizeH): DataFrame =
    resizeBatch(withPayload(spark, dir), w, h).toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        md5(col("payload")).as("payload_md5"),
        octet_length(col("payload")).cast("long").as("out_len"))

  /** Oracle-gated restatement of [[featureExtractBatch]]: the stub's
    * 8-bucket byte histogram UN-normalized back to exact integer counts
    * (count = round(feature·n) — the float division/multiplication
    * round-trip error is ≤ c·2⁻²³, far under the 0.5 rounding radius, so
    * recovery is exact), one (doc, bucket, count) row per histogram cell
    * including zeros. DuckDB replays the histogram directly. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val n = EventOps.tbl(spark, dir, "documents")
      .select(col("doc_id"), octet_length(col("text")).as("n"))
    featureExtractBatch(withPayload(spark, dir)).toDF()
      .select(col("doc_id"), posexplode(col("features")).as(Seq("bucket", "f")))
      .join(n, "doc_id")
      .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
        round(col("f") * greatest(col("n"), lit(1))).cast("long").as("cnt"))
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
