package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Event-time streaming operators the reference lacks entirely (its
  * `datetime` is carried as payload, never compared — SURVEY.md §2) but a
  * complete stream engine needs: watermarked tumbling/sliding aggregation,
  * session windows, and cross-batch streaming dedup.
  *
  * All operate on any DataFrame (streaming or batch) with an event-time
  * column; in streaming mode the watermark bounds state and drops late
  * data, which is the only way these stay O(live-windows) at 100 TB/day.
  */
object WindowedStreams {

  /** Tumbling event-time counts/sums with a watermark. Append-mode
    * emission: a window finalizes once the watermark passes its end. */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol)) * 100, 0).cast("long").as("sum_value_c"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value_c"))

  /** Sliding windows (overlapping assignment — one input row feeds
    * len/slide windows). */
  def sliding(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Session windows: gap-merged activity periods per key. */
  def sessions(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  /** Streaming latest-row-per-key — the incremental twin of
    * ExtraOps.latestPerKey (CDC/upsert compaction): per key, the row with
    * the greatest (event time, `idCol`) wins, revised in UPDATE mode as
    * batches arrive; an out-of-order older row never replaces a newer
    * one (max_by over the deterministic ordering struct). Pure built-in
    * aggregation, no custom state.
    *
    * State note: an un-windowed key aggregation is NOT watermark-evicted —
    * state is one row per distinct key, which for an upsert compaction is
    * the DEFINITION of the output (the latest-table itself), so state
    * size equals result size; a key space too large for that contract
    * should window the compaction instead. */
  def latestPerKeyStream(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val payload = struct(events.columns.toIndexedSeq.map(col): _*)
    events
      .groupBy(col(keyCol))
      .agg(max_by(payload, struct(col(tsCol), col(idCol))).as("latest"))
      // the payload struct already carries keyCol — emitting the group
      // key too would duplicate it (and collide outright on a source
      // column literally named like the alias), so the output schema is
      // exactly the input schema, one row per key, like the batch twin
      .select(col("latest.*"))
  }

  /** Streaming exact dedup on a key set: state bounded by the watermark
    * (duplicates arriving later than the watermark are not suppressed —
    * the documented at-least-once residue). */
  def dedup(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Streaming exact-CONTENT dedup — the exact-semantics complement to the
    * probabilistic [[suppressNearDups]] blacklist: a document whose text
    * hash was seen within the watermark horizon is dropped, bit-exact.
    * `dropDuplicatesWithinWatermark` keys the state on the content hash
    * and expires each entry one watermark-delay past its event time, so
    * the state store is bounded by |distinct texts per watermark window| —
    * the dedup key does NOT need the event-time column (unlike
    * `dropDuplicates`, where omitting it would pin state forever). A copy
    * arriving later than the horizon is the documented at-least-once
    * residue, same contract as [[dedup]].
    *
    * Null-text docs pass through untouched (md5(null) is null and
    * streaming dedup state treats null keys as EQUAL — without the split,
    * every null-text doc after the first would silently vanish; same
    * principle as `hasShingles`). WHICH copy of a within-batch duplicate
    * set survives is arrival-order-dependent (Spark's streaming dedup
    * keeps the first row to reach the state store) — suppression itself
    * is exact and deterministic, the surviving doc_id is not; the batch
    * twin `dedupExact` keeps min(doc_id) when a pipeline needs a
    * deterministic survivor. */
  def dedupExactText(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame = {
    val base = docs.withWatermark(tsCol, watermark)
    base.filter(col("text").isNotNull)
      .withColumn("text_h", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_h")
      .drop("text_h")
      .unionByName(base.filter(col("text").isNull))
  }

  /** Streaming benchmark-decontamination — the incremental twin of
    * TextOps.contaminationCheck: drop any arriving document that shares a
    * 3-word shingle with the (static, broadcast-sized) benchmark shingle
    * set. Completely STATELESS on the stream side — the benchmark set
    * joins in as a one-row broadcast array and each document is a map-side
    * `arrays_overlap` probe (an explode + anti-join + regroup would make
    * the regroup an unbounded stateful aggregation on a stream). No
    * watermark or state store; a benchmark set refresh is a restart with
    * a new static frame, same as any broadcast dimension.
    * `benchShingles` is any static relation with a string column `s`. */
  def decontaminate(docs: DataFrame, benchShingles: DataFrame): DataFrame = {
    import graft.operators.TextOps
    docs
      .crossJoin(broadcast(benchShingles.agg(
        collect_set(col("s")).as("bench_sh"))))
      // coalesce: null text ⇒ null shingles ⇒ null overlap, which must
      // read as clean (the batch twin simply has no shingles to hit),
      // not be silently filtered out as contaminated
      .filter(coalesce(
        !arrays_overlap(TextOps.shingles(col("text")), col("bench_sh")),
        lit(true)))
      .drop("bench_sh")
  }

  /** The COMPOSED streaming curation pipeline — the incremental twin of
    * TextOps.llmPipeline: arriving documents are
    *   1. exact-content-deduped within the watermark horizon
    *      ([[dedupExactText]], stateful, hash-keyed);
    *   2. quality-floored (stateless map over the shared
    *      TextOps.qualityBpOf formula — null/token-less text scores NULL
    *      and is dropped: unscorable means uncurated here);
    *   3. decontaminated against the static benchmark shingle set
    *      ([[decontaminate]], stateless one-row-broadcast probe);
    *   4. near-dup-suppressed by the stateful MinHash-band blacklist
    *      ([[suppressNearDups]]).
    *
    * Stage order is the scale design: both stateless filters sit between
    * the two stateful operators' cheap side and the blacklist, so junk
    * (low-quality, contaminated) never pins a bucket state row; exact
    * dedup runs first because a storm of bit-identical copies is the
    * common hot case and one hash-keyed state row is cheaper than a
    * verified band collision per copy. Chained stateful operators in one
    * query are a Spark 4 capability (append mode, watermark propagated
    * through both state stores). */
  def streamCuratePipeline(docs: DataFrame, benchShingles: DataFrame,
      tsCol: String = "ts", watermark: String = "10 minutes",
      minQualityBp: Long = 2500): Dataset[NovelDoc] = {
    val base = docs.select(col("doc_id"), col("text"), col(tsCol).as("ts"))
    val deduped = dedupExactText(base, "ts", watermark)
    val floored = deduped.filter(
      coalesce(graft.operators.TextOps.qualityBpOf(col("text"))
        >= minQualityBp, lit(false)))
    // core entry point: the watermark set by stage 1 propagates; setting
    // it again here would be rejected (see suppressNearDupsCore)
    suppressNearDupsCore(decontaminate(floored, benchShingles))
  }

  // -------------------------------------------------------------------------
  // Streaming near-dup suppression — the incremental twin of
  // TextOps.lshNearDupPairs: a stateful MinHash-band blacklist.
  //
  // CHECKPOINT COMPATIBILITY: the state schemas below changed incompatibly
  // when exact verification landed (suppressNearDups: BucketOwner ->
  // BucketOwners; nearDupHitLog's BucketOwner gained the `sh` field). A
  // checkpoint written by the pre-verification operators cannot be
  // restarted across that change — state deserialization fails (or worse,
  // misreads). [[stateSchemaVersions]] + [[versionedCheckpoint]] make the
  // break explicit: each operator's state encoding carries a version, the
  // checkpoint path is version-suffixed (a bump lands the restarted query
  // in a FRESH directory — one-TTL warm-up, never a deserialization
  // error; the reference's in-memory blacklist forgets on every restart,
  // so this is strictly no worse than reference semantics), and a marker
  // file inside the directory fails LOUDLY with instructions if a
  // checkpoint from a different version is ever pointed at directly.
  // -------------------------------------------------------------------------

  /** Current state-schema version per stateful operator in this file —
    * bump on ANY incompatible change to the operator's state case
    * classes (the pre-/post-verification change above is exactly the
    * class of break this records). */
  val stateSchemaVersions: Map[String, Int] = Map(
    "suppressNearDups" -> 2, // v1: single BucketOwner; v2: BucketOwners LRU list
    "nearDupHitLog" -> 2, // v1: id-only owner; v2: BucketOwner carries sh
    "suppressEmbedNearDups" -> 1)

  /** Resolve the checkpoint location for one of this file's stateful
    * operators: `root/op-vN` where N is the operator's current state
    * version. A schema bump changes the directory, so an upgraded query
    * starts from fresh state (one-TTL warm-up) instead of dying inside
    * the state store; the version marker stamped into the directory
    * makes any direct mismatch (a copied/renamed checkpoint, a version
    * edit without a migration, a pre-versioning checkpoint dropped into
    * the versioned path) fail loudly at START with instructions, not
    * mid-batch with a deserialization error. Paths go through the
    * Hadoop FileSystem API, so `root` may be any checkpoint-capable URI
    * (local, hdfs://, s3a://), exactly like `checkpointLocation`
    * itself. */
  def versionedCheckpoint(root: String, op: String): String = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val version = stateSchemaVersions.getOrElse(op,
      throw new IllegalArgumentException(s"unknown stateful operator '$op' " +
        s"(known: ${stateSchemaVersions.keys.toSeq.sorted.mkString(", ")})"))
    val dir = new Path(root, s"$op-v$version")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs: FileSystem = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val marker = new Path(dir, "_graft_state_version")
    def readAndValidateMarker(): Unit = {
      val in = fs.open(marker)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      if (found != version.toString)
        throw new IllegalStateException(
          s"checkpoint at $dir was written under $op state-schema v$found " +
            s"but this build encodes v$version: the operator's state " +
            "changed incompatibly. Point the restarted query at a fresh " +
            "checkpointLocation (versionedCheckpoint does this " +
            "automatically when the version constant is bumped) and " +
            "accept the one-TTL state warm-up.")
    }
    if (fs.exists(marker)) {
      readAndValidateMarker()
    } else {
      // a marker-less directory that already CONTAINS checkpoint
      // structure is a checkpoint of unknown schema (pre-versioning
      // build, or a copy that dropped the marker) — stamping it would
      // just defer the failure to state-store deserialization
      val hasCheckpoint = Seq("offsets", "state", "commits")
        .exists(d => fs.exists(new Path(dir, d)))
      if (hasCheckpoint)
        throw new IllegalStateException(
          s"checkpoint at $dir has streaming-checkpoint structure but no " +
            s"$op state-schema marker — it predates state versioning or " +
            "lost its marker in a copy, so its schema is unknown. Point " +
            "the restarted query at a fresh checkpointLocation (and " +
            "accept the one-TTL state warm-up), or restore the original " +
            "_graft_state_version file if this is a faithful copy.")
      // Two queries may resolve the same fresh dir concurrently (e.g. a
      // supervisor relaunching both halves of a topology). A direct
      // create is doubly racy: the loser gets a raw
      // FileAlreadyExistsException, and — worse — a reader can observe
      // the marker EXISTING but still EMPTY between the winner's create
      // and write (caught by the hammer spec as "state-schema v'' ").
      // So the marker is stamped via write-to-temp + atomic rename: it
      // only ever becomes visible complete. Loser handling is per-FS
      // (round-7 ADVICE): on HDFS-like stores rename-onto-existing fails,
      // and the loser deletes its temp and validates the winner's marker;
      // on LocalFileSystem/POSIX rename REPLACES the existing marker and
      // returns true, so both racers "win" — benign, because the marker
      // content is fully determined by (op, version) and the version is
      // baked into the directory name, so any winner writes identical
      // bytes. The hammer spec drives this race on the local FS.
      val tmp = new Path(dir,
        s"._graft_state_version.tmp.${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      val renamed = try fs.rename(tmp, marker) catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
      if (!renamed) {
        fs.delete(tmp, false)
        readAndValidateMarker()
      }
    }
    dir.toString
  }

  /** One incoming document exploded onto a MinHash band bucket. `sh` is
    * the doc's sorted distinct shingle-HASH set (xxhash64 per shingle):
    * Jaccard over 64-bit shingle hashes equals Jaccard over the shingle
    * strings up to a ~2⁻⁶⁴-per-pair collision — it rides along so a band
    * collision can be EXACT-verified without a document-store join. */
  case class BandedDoc(bucket: String, doc_id: Long, text: String,
      ts: java.sql.Timestamp, sh: Array[Long])

  /** Novelty verdict / emitted novel document. */
  case class NovelDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** A band collision, exact-verified: `doc_b` arrived while `doc_a` owned
    * the bucket; `jaccard_bp` is their exact shingle Jaccard in floored
    * basis points (10000 = identical shingle sets). */
  case class DupHit(doc_a: Long, doc_b: Long, band: Int, jaccard_bp: Long)

  /** One remembered bucket claimant: id + shingle-hash set for verify. */
  case class OwnerSig(doc_id: Long, sh: Array[Long])

  /** Bucket blacklist state: the verified-distinct documents that claimed
    * the bucket (bounded — see [[suppressNearDups]]). */
  case class BucketOwners(owners: List[OwnerSig])

  /** Hit-log state: the first document that claimed the bucket. */
  case class BucketOwner(doc_id: Long, sh: Array[Long])

  /** One merge pass over two sorted distinct hash sets →
    * (intersection, union). The single definition both predicates below
    * derive from — note `jaccardBp >= threshold·10000` is NOT equivalent
    * to [[similar]] because of flooring, so both need the raw counts. */
  private def interUnion(a: Array[Long], b: Array[Long]): (Long, Long) = {
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    (inter, a.length.toLong + b.length - inter)
  }

  /** Exact Jaccard between two sorted distinct hash sets, floored basis
    * points. */
  private[streaming] def jaccardBp(a: Array[Long], b: Array[Long]): Long = {
    val (inter, union) = interUnion(a, b)
    if (union == 0) 0L else inter * 10000L / union
  }

  /** The batch twin's verify predicate (`common >= threshold·union`,
    * TextOps.dedupNgramJaccard) on merged hash sets. */
  private def similar(a: Array[Long], b: Array[Long],
      threshold: Double): Boolean = {
    val (inter, union) = interUnion(a, b)
    union > 0 && inter.toDouble >= threshold * union
  }

  /** MinHash band bucket as a PER-ROW expression (band =
    * TextOps.MinhashRows of the signature hashes, same banding as
    * TextOps.lshNearDupPairs): each min-hash folds inside the shingle
    * array via HOFs, so the signature costs zero shuffles and zero
    * extra stateful operators — on a stream a groupBy-based signature
    * would itself be an unbounded stateful agg. Callers filter to
    * `hasShingles` first — shingle-less documents must never reach the
    * stateful operator (see [[bandedDocs]]). */
  private def bandBucket(band: Int, text: Column): Column = {
    import graft.operators.TextOps
    val r = TextOps.MinhashRows
    val sh = TextOps.shingles(text)
    val mhs = TextOps.minhashParams.slice(band * r, band * r + r).map {
      case (a, b) =>
        array_min(transform(sh,
          s => (lit(a) * TextOps.weakHash(s) + lit(b)) % TextOps.MOD))
    }
    concat_ws("_", lit(band.toString) +: mhs: _*)
  }

  // coalesce: null text ⇒ null shingles ⇒ a NULL predicate would exclude
  // the row from BOTH union branches (filter(p) and filter(!p) each drop
  // NULL) — null text must route to the stateless pass-through like any
  // other shingle-less doc, not silently vanish
  private def hasShingles: Column =
    coalesce(size(graft.operators.TextOps.shingles(col("text"))) > 0,
      lit(false))

  /** Shingle-bearing docs exploded onto their band buckets. Documents with
    * NO shingles (< 3 tokens) are excluded here and handled stateless by
    * the callers: with nothing to judge similarity on they can never
    * collide, so routing them through the stateful operator would only pin
    * a state-store row per short doc for the full TTL (a dirty stream full
    * of stub documents would bloat state for zero suppression value). */
  private def bandedDocs(docs: DataFrame, nBands: Int): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(hasShingles)
      .select(explode(array((0 until nBands).map(b =>
          bandBucket(b, col("text"))): _*)).as("bucket"),
        col("doc_id"), col("text"), col("ts"),
        array_sort(array_distinct(transform(
          graft.operators.TextOps.shingles(col("text")),
          s => xxhash64(s)))).as("sh"))
      .as[BandedDoc]
  }

  /** Deterministic within-batch order: event time, then doc_id. */
  private def ordered(it: Iterator[BandedDoc]): Seq[BandedDoc] =
    it.toSeq.sortBy(d => (d.ts.getTime, d.doc_id))

  /** Arm the bucket's event-time expiry: a bucket silent for `ttl` past
    * its last-seen EVENT TIME is forgotten, so state is bounded by
    * |buckets active within the TTL window| — the streaming analogue of
    * the batch op's corpus-bounded bucket table.
    * EventTimeTimeout (not processing-time) keeps AvailableNow drains
    * terminable: the timeout clock is the watermark, which stops when the
    * data does. The expiry MUST anchor on the batch's max event time, not
    * `getCurrentWatermarkMs()`: the watermark visible inside batch N is the
    * one computed after batch N-1 (0 in the first batch), so a
    * watermark-anchored expiry lands astern of the post-batch watermark
    * jump and the very next (no-data) batch would evict everything. */
  private def armExpiry(state: GroupState[_], maxEventMs: Long,
      ttlMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(maxEventMs, state.getCurrentWatermarkMs()) + ttlMs)

  /** Suppress near-duplicate documents across micro-batches: a document
    * whose band bucket is already claimed is EXACT-verified (shingle
    * Jaccard ≥ `threshold`, the batch twin's predicate) against the
    * bucket's remembered claimants and suppressed only on a verified
    * match; a collision below the threshold flows through — a raw band
    * collision is a CANDIDATE, not a verdict (a 2-hash band collides
    * moderately-similar docs with probability ~s², which unverified
    * suppression would silently delete from the training stream).
    *
    * Precision: exact — only documents whose verified Jaccard clears the
    * threshold are dropped. Recall: a bucket remembers at most
    * `maxOwners` verified-distinct claimants (bounded state per bucket),
    * replaced LRU — a newly emitted doc evicts the OLDEST claimant at
    * the cap, so recent documents are always suppressible; duplicates of
    * an EVICTED claimant pass through (bounded state has to forget
    * something, and oldest-first loses the least). As in any banding
    * scheme a qualifying pair that never shares a band bucket is also
    * missed (raise `nBands`→rows per band for sharper thresholds; exact
    * duplicates always share every bucket, so an exact copy is
    * suppressed whenever its original is still among the bucket's
    * remembered claimants). Single band by default: suppression
    * needs ONE verdict per doc, and one band = one bucket = one state
    * row — multi-band OR-semantics belong to [[nearDupHitLog]], whose
    * output is per-collision rather than per-doc.
    *
    * LRU means hits refresh recency: a claimant that keeps matching
    * (suppressing) newcomers moves back to the tail of the owner list, so
    * the evicted-at-cap owner is the least-recently-MATCHED, not merely
    * the oldest-admitted — a hot duplicate source stays suppressible
    * indefinitely. */
  def suppressNearDups(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes",
      ttlMs: Long = 24L * 3600 * 1000,
      threshold: Double = 0.5, maxOwners: Int = 8): Dataset[NovelDoc] =
    suppressNearDupsCore(docs
        .withWatermark(tsCol, watermark)
        .select(col("doc_id"), col("text"), col(tsCol).as("ts")),
      ttlMs, threshold, maxOwners)

  /** [[suppressNearDups]] over a stream that ALREADY carries its
    * watermark and the (doc_id, text, ts) shape — the composition entry
    * point: re-applying `withWatermark` downstream of another stateful
    * operator is rejected by Spark ("Redefining watermark is
    * disallowed"), so a chained pipeline sets the watermark ONCE at the
    * source and every stage after it consumes the propagated one. */
  private[streaming] def suppressNearDupsCore(base: DataFrame,
      ttlMs: Long = 24L * 3600 * 1000,
      threshold: Double = 0.5, maxOwners: Int = 8): Dataset[NovelDoc] = {
    require(maxOwners >= 1,
      s"maxOwners must be >= 1 (got $maxOwners): a bucket that remembers " +
        "no claimants can never suppress anything")
    val spark = base.sparkSession
    import spark.implicits._
    // shingle-less docs can't collide: stateless pass-through, no state row
    val short = base.filter(!hasShingles).as[NovelDoc]
    val judged = bandedDocs(base, nBands = 1)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: String, it: Iterator[BandedDoc], state: GroupState[BucketOwners]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = ordered(it)
            val out = scala.collection.mutable.ArrayBuffer[NovelDoc]()
            var owners = state.getOption.map(_.owners).getOrElse(Nil)
            batch.foreach { d =>
              // claimed (this or an earlier batch) AND verified → suppress
              owners.find(o => similar(o.sh, d.sh, threshold)) match {
                case Some(hit) =>
                  // true LRU: the matched claimant is the most recently
                  // USED — refresh its position so a hot duplicate source
                  // is never the eviction victim
                  owners = owners.filterNot(_ eq hit) :+ hit
                case None =>
                  out += NovelDoc(d.doc_id, d.text, d.ts)
                  // evict the least-recently-used claimant at the cap so
                  // the NEW doc's later duplicates stay suppressible
                  owners = (if (owners.length < maxOwners) owners
                    else owners.tail) :+ OwnerSig(d.doc_id, d.sh)
              }
            }
            val maxEventMs = batch.map(_.ts.getTime).max
            if (owners.nonEmpty) { // always true past maxOwners >= 1
              state.update(BucketOwners(owners))
              armExpiry(state, maxEventMs, ttlMs)
            }
            out.iterator
          }
      }
    judged.union(short)
  }

  /** The duplicate-pair LOG — the straight streaming twin of
    * lshNearDupPairs' candidate generation with OR-across-bands semantics:
    * every band collision emits (bucket owner, newcomer, band, exact
    * Jaccard in basis points) as it happens — the owner's shingle set
    * rides in state, so the hit is pre-verified and consumers threshold
    * on `jaccard_bp` directly. Per-collision output needs no cross-band
    * combination, so the multi-band OR costs no second stateful operator;
    * consumers (an audit sink, a dedup ledger) dedupe pairs colliding in
    * both bands. */
  def nearDupHitLog(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes",
      nBands: Int = graft.operators.TextOps.MinhashBands,
      ttlMs: Long = 24L * 3600 * 1000): Dataset[DupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .withWatermark(tsCol, watermark)
      .select(col("doc_id"), col("text"), col(tsCol).as("ts"))
    bandedDocs(base, nBands)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (bucket: String, it: Iterator[BandedDoc],
         state: GroupState[BucketOwner]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val band = bucket.takeWhile(_ != '_').toInt
            val batch = ordered(it)
            val out = scala.collection.mutable.ArrayBuffer[DupHit]()
            var owner = state.getOption
            batch.foreach { d =>
              owner match {
                case Some(o) if o.doc_id != d.doc_id =>
                  // the owner's shingle set travels in state, so each hit
                  // carries its EXACT Jaccard — consumers threshold on
                  // jaccard_bp directly instead of re-joining a doc store
                  out += DupHit(o.doc_id, d.doc_id, band, jaccardBp(o.sh, d.sh))
                case Some(_) => ()
                case None => owner = Some(BucketOwner(d.doc_id, d.sh))
              }
            }
            val maxEventMs = batch.map(_.ts.getTime).max
            owner.foreach { o =>
              state.update(o)
              armExpiry(state, maxEventMs, ttlMs)
            }
            out.iterator
          }
      }
  }

  // -------------------------------------------------------------------------
  // Streaming EMBEDDING near-dup suppression (state API v2)
  // -------------------------------------------------------------------------

  /** A bucketed embedding event entering the suppressor. */
  case class BucketedVec(bucket: Long, vec_id: Long, embedding: Seq[Float],
      ts: java.sql.Timestamp)

  /** An admitted (novel) vector. */
  case class NovelVec(vec_id: Long, ts: java.sql.Timestamp)

  /** A remembered bucket claimant: id + raw embedding for exact verify. */
  case class VecOwner(vec_id: Long, emb: Seq[Float])

  /** Exact cosine between two float embeddings, double accumulation in
    * index order (the Kernels.dotFF fold — same arithmetic as the batch
    * ops). 0 when either norm is 0, and 0 on DIMENSION MISMATCH: vectors
    * from different embedding spaces are never "similar" — truncating to
    * a shared prefix could suppress a vector as a duplicate of (or admit
    * it as a claimant against) one of a different dimensionality. */
  private[streaming] def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    if (a.length != b.length) return 0.0
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The embedding suppressor as a state-API-v2 StatefulProcessor — the
    * streaming-similarity twin of [[suppressNearDups]] over vectors
    * instead of shingles, and the `transformWithState` showcase for
    * LIST-shaped state: the per-bucket claimant list lives in a
    * `ListState[VecOwner]` (per-element storage — an LRU rewrite touches
    * the list, not a whole serialized blob) with declarative TTL.
    * Same precision/recall contract as the text twin: SRP bucket =
    * candidate, exact cosine = verdict; at most `maxOwners` claimants
    * per bucket, evicted least-recently-MATCHED. */
  class EmbedDedupProcessor(threshold: Double, maxOwners: Int,
      ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, BucketedVec, NovelVec] {
    import org.apache.spark.sql.{Encoders => JE}
    import org.apache.spark.sql.streaming.{ListState, OutputMode => OM, TimeMode, TimerValues, TTLConfig}

    @transient private var owners: ListState[VecOwner] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      owners = getHandle.getListState[VecOwner]("owners",
        JE.product[VecOwner], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(bucket: Long, rows: Iterator[BucketedVec],
        timerValues: TimerValues): Iterator[NovelVec] = {
      // deterministic within-batch order, like the text twin's ordered()
      val batch = rows.toSeq.sortBy(v => (v.ts.getTime, v.vec_id))
      var cur: List[VecOwner] = owners.get().toList
      val out = scala.collection.mutable.ArrayBuffer[NovelVec]()
      batch.foreach { v =>
        cur.find(o => cosine(o.emb, v.embedding) >= threshold) match {
          case Some(hit) => // verified duplicate: suppress, LRU-refresh
            cur = cur.filterNot(_ eq hit) :+ hit
          case None =>
            out += NovelVec(v.vec_id, v.ts)
            cur = (if (cur.length < maxOwners) cur else cur.tail) :+
              VecOwner(v.vec_id, v.embedding)
        }
      }
      owners.put(cur.toArray) // rewrite; put() re-arms the TTL clock
      out.iterator
    }
  }

  /** Suppress near-duplicate EMBEDDINGS across micro-batches: a vector
    * whose SRP bucket already has a claimant within cosine `threshold`
    * is dropped; novel vectors are admitted and remembered. Candidates
    * are per-bucket only (2^nBits buckets bound the state fan-out; a
    * qualifying pair in different buckets is missed — (1 − θ/π)^nBits
    * recall, 1.0 for exact copies), the verdict is the exact cosine.
    *
    * `ttlMs > 0` runs TimeMode.ProcessingTime so claimants expire after
    * quiet-period TTL (state bounded by |recently-claiming buckets|);
    * `ttlMs = 0` is the drain/test mode (TimeMode.None — batches only on
    * data; state bounded by 2^nBits · maxOwners). Requires the RocksDB
    * state store provider.
    *
    * WARNING — the 24 h default selects ProcessingTime, which keeps
    * scheduling (empty) micro-batches: a query built with the default
    * NEVER terminates under Trigger.AvailableNow / processAllAvailable.
    * Batch/test callers draining a finite input must use
    * [[suppressEmbedNearDupsDrain]] (or pass `ttlMs = 0`) — the
    * continuous default is for genuinely unbounded streams only. */
  def suppressEmbedNearDups(vecs: DataFrame, tsCol: String = "ts",
      threshold: Double = 0.9, nBits: Int = 8, maxOwners: Int = 8,
      ttlMs: Long = 24L * 3600 * 1000): Dataset[NovelVec] = {
    require(maxOwners >= 1,
      s"maxOwners must be >= 1 (got $maxOwners)")
    val spark = vecs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    val (ttl, mode) =
      if (ttlMs > 0)
        (Some(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (None, TimeMode.None())
    vecs
      .select(
        graft.operators.SimilarityOps.srpBucket(col("embedding"), nBits)
          .cast("long").as("bucket"),
        col("vec_id"), col("embedding"), col(tsCol).as("ts"))
      .as[BucketedVec]
      .groupByKey(_.bucket)
      .transformWithState(
        new EmbedDedupProcessor(threshold, maxOwners, ttl), mode, OM.Append())
  }

  /** [[suppressEmbedNearDups]] in DRAIN mode (TimeMode.None — no TTL, no
    * empty-batch scheduling): the factory for Trigger.AvailableNow /
    * processAllAvailable callers, which would never terminate under the
    * continuous default's ProcessingTime configuration. State is bounded
    * by 2^nBits · maxOwners claimants for the life of the query. */
  def suppressEmbedNearDupsDrain(vecs: DataFrame, tsCol: String = "ts",
      threshold: Double = 0.9, nBits: Int = 8,
      maxOwners: Int = 8): Dataset[NovelVec] =
    suppressEmbedNearDups(vecs, tsCol, threshold, nBits, maxOwners, ttlMs = 0L)

  /** Streaming incremental dedup — the production crawl-ingest topology:
    * each micro-batch is a fresh crawl INCREMENT, deduplicated against a
    * FROZEN seen-corpus via the batch op's exact dataflow
    * ([[graft.operators.TextOps.dedupIncrementalAgainst]]: md5 exact
    * match, MinHash stream–static band join, shingle-Jaccard verify).
    * The frozen side participates as its three ingest-time artifacts
    * ([[graft.operators.TextOps.SeenIndex]]), pinned in memory ONCE for
    * the life of the query — no per-batch recomputation of corpus
    * signatures; the increment is the small side of every join.
    *
    * Because a verdict depends only on (fresh doc, frozen corpus), the
    * result is batching-invariant: the union of all micro-batch outputs
    * equals one batch `dedupIncrementalOf(allFresh, seen)` run — the
    * parity StreamingSpec pins, including across a checkpoint restart
    * (offset tracking in `checkpointDir` means a restarted query resumes
    * at the first unprocessed increment; delivery to `sink` is
    * at-least-once, same note as StreamPipeline.ParquetSinks).
    *
    * Intra-increment and increment-vs-earlier-increment duplicates are
    * DELIBERATELY out of scope here (frozen means frozen); compose
    * [[suppressNearDups]] upstream for stream-internal dedup, and fold
    * accepted docs into the corpus at the next index rebuild.
    *
    * `sink(verdicts, batchId)` must run its own action (write/collect) —
    * the verdict relation is lazy and only valid inside the callback
    * (the fresh-side cache is dropped when it returns). */
  def dedupIncrementalStream(
      freshDocs: DataFrame, // streaming (doc_id, text)
      seenIndex: graft.operators.TextOps.SeenIndex,
      checkpointDir: String,
      sink: (DataFrame, Long) => Unit,
      threshold: Double = graft.operators.TextOps.DefaultNearDupThreshold,
      availableNow: Boolean = true,
      containment: Boolean = false): StreamingQuery = {
    val w = freshDocs.writeStream
      .queryName("graft-incremental-dedup")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the increment feeds four subtrees (hash, band, shingle verify,
        // final left joins) with no common-subplan sharing — same
        // persistence rationale as the batch op. `containment` adds the
        // quoted-inside modality (frozen spanSets artifact) — verdicts
        // stay per-(fresh doc, frozen corpus), so batching invariance and
        // restart semantics are unchanged.
        val fresh = batch.toDF().select(col("doc_id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try sink(
          graft.operators.TextOps.dedupIncrementalAgainst(
            fresh, seenIndex, threshold, containment),
          batchId)
        finally fresh.unpersist(true)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Streaming connected components over the corroborated pair stream —
    * the incremental twin of
    * [[graft.operators.TextOps.dedupClustersFromReport]] (round-11
    * VERDICT item 8, completing the triage story in the streaming
    * surface): each micro-batch's evidence pairs are thresholded on
    * `n_modalities` (same default as the batch op, so the two surfaces
    * agree on what "corroborated" means), merged into a persistent label
    * store, and the FULL updated (doc_id, cluster_rep) relation is
    * handed to `sink` — update-mode semantics: after batch N the sink
    * holds every streamed doc's current component representative.
    *
    * State = the label store itself, a versioned parquet relation under
    * `labelStoreDir/v=<version>` plus a `_meta.json` record mapping the
    * newest version to the batch id that produced it: each batch unions
    * the newest committed state's (doc_id, cluster_rep) rows — star
    * edges, which encode all prior merges in O(docs) rows regardless of
    * how many pairs produced them — with the batch's fresh corroborated
    * pairs, resolves components via the bounded
    * [[graft.operators.TextOps.dedupClustersFromPairs]] (driver
    * union-find under the edge cap, distributed min-label above it),
    * and writes the next version. Versions are DECOUPLED from batch ids
    * through the meta record, so the accumulated store survives a
    * streaming-checkpoint reset (batch ids restart at 0; the new run
    * RESUMES on top of the newest committed version) instead of being
    * ignored and pruned. Crash-replay detection keys on BOTH a per-run
    * token and the batch id: batch ids alone are ambiguous — a fresh
    * checkpoint restarts at 0, so a store whose newest fold came from
    * some earlier run's batch 0 must treat an incoming batch 0 as a NEW
    * fold (advance on top of the committed state), not a replay
    * (overwrite it from its prior). Only a (run, batch) pair matching
    * the meta record reuses the recorded version and prior. Replays
    * that arrive under a NEW run token (a crashed query restarted from
    * the same checkpoint re-delivers its last batch id with a fresh
    * token) take the advance path instead, which is safe because the
    * fold is idempotent: star edges of the same pairs plus the same
    * pairs yield the same components, and the advance path's prior is
    * the newest committed version — which already holds that fold.
    * Versions are pruned to the newest two so the store stays O(docs),
    * not O(batches·docs).
    *
    * Batching-invariant BY CONSTRUCTION: star edges preserve exactly the
    * connectivity of the pairs folded so far, and the min-id
    * representative is associative across merges — so the store after
    * the last batch equals one batch `dedupClustersFromReport`-style run
    * over the union of all corroborated pairs (the parity
    * WindowedStreamsSpec pins, including a cross-batch component
    * merge). At 100 TB-ingest scale every per-batch relation is
    * O(docs-clustered-so-far): the store is star-compressed, fresh pairs
    * are the increment, and no corpus-sized recomputation occurs. */
  def clusterReportStream(
      pairs: DataFrame, // streaming (doc_a, doc_b, n_modalities)
      checkpointDir: String,
      labelStoreDir: String,
      sink: (DataFrame, Long) => Unit,
      minModalities: Long =
        graft.operators.TextOps.ReportClusterMinModalities,
      availableNow: Boolean = true): StreamingQuery = {
    // one token per stream START (≈ Spark's StreamingQuery.runId, which
    // is not yet constructed when this closure is built): replay
    // detection requires run+batch to BOTH match the meta record
    val runToken = java.util.UUID.randomUUID().toString
    val w = pairs.writeStream
      .queryName("graft-cluster-report")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.toDF()
          .filter(col("n_modalities") >= minModalities)
          .select(col("doc_a").cast("long").as("doc_a"),
            col("doc_b").cast("long").as("doc_b"))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(labelStoreDir),
          spark.sparkContext.hadoopConfiguration)
        val root = new org.apache.hadoop.fs.Path(labelStoreDir)
        // committed = has Spark's _SUCCESS marker: a crash mid-write
        // leaves an uncommitted dir that must not be read as state
        def versions(): Seq[Long] =
          if (!fs.exists(root)) Nil
          else fs.listStatus(root).toSeq.map(_.getPath)
            .filter(p => p.getName.startsWith("v=") &&
              fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
            .map(_.getName.stripPrefix("v=").toLong)
        // Store versions are decoupled from batch ids through a meta
        // record, so the store SURVIVES a streaming-checkpoint reset
        // (ids restart at 0) instead of being silently ignored and then
        // pruned away. A crash replay is recognised ONLY when both the
        // run token and the batch id match the meta record (batch id
        // alone is ambiguous: a fresh checkpoint restarts ids at 0, and
        // a store last folded by some run's batch 0 must NOT mistake a
        // new run's batch 0 for a replay — that would re-read the
        // recorded PRIOR and drop the committed fold). A recognised
        // replay overwrites its own version and re-reads that version's
        // recorded prior (idempotent — the fold is a pure function of
        // (prior state, batch pairs)); anything else advances to a new
        // version on top of the newest committed state, which is equally
        // idempotent for same-checkpoint replays arriving under a new
        // run token. Meta is written AFTER the parquet commit, so a
        // crash between the two replays cleanly: the stale meta makes
        // the retry reuse the same version number and overwrite the
        // half-written dir.
        val metaPath = new org.apache.hadoop.fs.Path(root, "_meta.json")
        def readMeta(): Option[(Long, Long, Long, String)] =
          if (!fs.exists(metaPath)) None
          else {
            val in = fs.open(metaPath)
            val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            val re = """"version"\s*:\s*(-?\d+).*"batch"\s*:\s*(-?\d+)""" +
              """.*"prior"\s*:\s*(-?\d+)"""
            val runRe = """"run"\s*:\s*"([^"]*)"""".r
            re.r.unanchored.findFirstMatchIn(s)
              .map(m => (m.group(1).toLong, m.group(2).toLong,
                m.group(3).toLong,
                // metas from before the run field default to a token no
                // live run can hold, so they always take the advance path
                runRe.unanchored.findFirstMatchIn(s)
                  .map(_.group(1)).getOrElse("")))
          }
        val (version, priorVersion) = readMeta() match {
          case Some((v, b, p, r)) if b == batchId && r == runToken =>
            (v, p) // crash replay within this run
          case Some((v, _, _, _)) => (v + 1, v) // next batch / new run / fresh ckpt
          case None => (0L, -1L) // empty store
        }
        val priorEdges =
          if (priorVersion >= 0 && versions().contains(priorVersion))
            spark.read.parquet(s"$labelStoreDir/v=$priorVersion")
              .select(col("doc_id").as("doc_a"),
                col("cluster_rep").as("doc_b"))
          else fresh.limit(0)
        val labels =
          graft.operators.TextOps.dedupClustersFromPairs(
            priorEdges.unionByName(fresh))
        labels.write.mode("overwrite")
          .parquet(s"$labelStoreDir/v=$version")
        val meta = s"""{"version":$version,"batch":$batchId,""" +
          s""""prior":$priorVersion,"run":"$runToken"}"""
        val out = fs.create(metaPath, true)
        try out.write(meta.getBytes("UTF-8")) finally out.close()
        // hand the sink the COMMITTED store (re-read, not the lazy plan:
        // the plan reads the prior version, which pruning deletes below)
        sink(spark.read.parquet(s"$labelStoreDir/v=$version"), batchId)
        versions().filter(v => v != version && v != priorVersion)
          .foreach(v => fs.delete(
            new org.apache.hadoop.fs.Path(s"$labelStoreDir/v=$v"), true))
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
