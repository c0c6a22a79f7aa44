package graft

import graft.streaming.WindowedStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Ev(ts: Timestamp, k: String, v: Double)
case class DocEv(ts: Timestamp, doc_id: Long, text: String)
case class FreshDoc(doc_id: Long, text: String)
case class RPair(doc_a: Long, doc_b: Long, n_modalities: Long)

/** Event-time semantics under a real streaming execution: watermark
  * finalization, late-data dropping, session merging, dedup state. */
class WindowedStreamsSpec extends SparkSpec {

  def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("tumbling windows with watermark drop late data (append mode)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = WindowedStreams.tumbling(src.toDF(), "ts", "k", "v",
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    try {
      // batch 1: events in the 10:00 and 10:10 windows
      src.addData(Ev(t(1), "a", 1.0), Ev(t(2), "a", 2.0), Ev(t(11), "a", 4.0))
      q.processAllAvailable()
      // batch 2: advance watermark far past 10:10 window end
      src.addData(Ev(t(40), "a", 8.0))
      q.processAllAvailable()
      // batch 3: a LATE event for the long-closed 10:00 window → dropped
      src.addData(Ev(t(3), "a", 100.0))
      q.processAllAvailable()
      // batch 4: nudge watermark so finalized state flushes
      src.addData(Ev(t(55), "a", 16.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM tumb").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getLong(3)))
        .toSet
      // 10:00 window finalized with ONLY the on-time events (1+2, not 100)
      assert(rows.contains(("2024-01-01 10:00:00.0", 2L, 300L)), rows)
      assert(rows.contains(("2024-01-01 10:10:00.0", 1L, 400L)), rows)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = WindowedStreams.sessions(src.toDF(), "ts", "k",
      "5 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two bursts separated by > gap → two sessions for key a
      src.addData(Ev(t(0), "a", 1), Ev(t(2), "a", 1), Ev(t(4), "a", 1),
        Ev(t(20), "a", 1), Ev(t(21), "a", 1))
      q.processAllAvailable()
      src.addData(Ev(t(59), "z", 1)) // advance watermark to close sessions
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess WHERE k = 'a'").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(3)))
      assert(rows.toSet === Set(
        ("2024-01-01 10:00:00.0", 3L),
        ("2024-01-01 10:20:00.0", 2L)), rows.mkString(","))
    } finally q.stop()
  }

  test("streaming latest-per-key keeps the newest row; late rows never regress it") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = WindowedStreams.latestPerKeyStream(src.toDF(), "k", "ts", "v")
    val q = out.writeStream.format("memory").queryName("latest")
      .outputMode("update").start()
    try {
      src.addData(Ev(t(1), "a", 1.0), Ev(t(5), "a", 2.0), Ev(t(2), "b", 3.0))
      q.processAllAvailable()
      // batch 2: a newer row for a (wins) and an OUT-OF-ORDER older row
      // for b (must NOT replace b's t(2) row)
      src.addData(Ev(t(9), "a", 4.0), Ev(t(1), "b", 5.0))
      q.processAllAvailable()
      // memory sink in update mode appends revisions; the last row per
      // key is the compacted value. Output schema = input schema (ts, k,
      // v), one row per key
      val rows = spark.sql(
          "SELECT k, v FROM (SELECT k, v, row_number() OVER " +
            "(PARTITION BY k ORDER BY ts DESC, v DESC) rn FROM latest) WHERE rn = 1")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(rows === Set(("a", 4.0), ("b", 3.0)), rows)
    } finally q.stop()
  }

  test("streaming dedup suppresses within-watermark duplicates") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val out = WindowedStreams.dedup(src.toDF(), "ts", "10 minutes",
      Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      src.addData(Ev(t(1), "a", 1), Ev(t(1), "a", 1), Ev(t(2), "b", 1))
      q.processAllAvailable()
      src.addData(Ev(t(1), "a", 1)) // cross-batch duplicate, still in state
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM dedup").count() === 2)
    } finally q.stop()
  }

  test("near-dup blacklist suppresses a duplicate doc arriving in a later batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.suppressNearDups(src.toDF())
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      val a = "the quick brown fox jumps over the lazy dog"
      val b = "colorless green ideas sleep furiously all night long"
      val c = "a completely different third document about spark engines"
      src.addData(DocEv(t(1), 1, a), DocEv(t(2), 2, b))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1's text (same signature, same
      // bucket -> suppressed); doc 4 is novel; docs 5+6 duplicate EACH
      // OTHER within the batch (first claims, second suppressed) — their
      // shared text must be UNRELATED to c, or they'd legitimately
      // near-dup-collide with doc 4's bucket
      val e = "tungsten codegen stages fuse narrow transformations tightly"
      // docs 7+8: < 3 tokens, no shingles — stateless pass-through (BOTH
      // emitted, no state row), never judged for similarity
      src.addData(DocEv(t(11), 3, a), DocEv(t(12), 4, c),
        DocEv(t(13), 5, e), DocEv(t(14), 6, e),
        DocEv(t(15), 7, "too short"), DocEv(t(16), 8, "too short"),
        // null text: must route through the stateless branch, not vanish
        // (a bare NULL predicate is dropped by BOTH filter(p)/filter(!p))
        DocEv(t(17), 9, null))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT doc_id FROM neardup").collect()
        .map(_.getLong(0)).toSet
      assert(emitted === Set(1L, 2L, 4L, 5L, 7L, 8L, 9L), emitted)
    } finally q.stop()
  }

  test("near-dup blacklist does NOT suppress a dissimilar band collision") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // Precomputed pair: same band-0 bucket (both 2-hash minima agree) but
    // Jaccard 3/9 = 0.33 < 0.5 — a raw band collision that unverified
    // suppression would have silently deleted from the stream. The bucket
    // equality is asserted below from the engine's own public hash chain,
    // so a hash-parameter change fails loudly instead of testing nothing.
    val base = "alpha beta gamma delta epsilon"
    val collider = "alpha beta gamma delta epsilon zeta eta xi omicron rho digamma"
    locally {
      import graft.operators.TextOps
      import org.apache.spark.sql.functions._
      val bucket = (text: String) => {
        val sh = TextOps.shingles(lit(text))
        val mins = TextOps.minhashParams.take(TextOps.MinhashRows).map { case (a, b) =>
          array_min(transform(sh,
            s => (lit(a) * TextOps.weakHash(s) + lit(b)) % TextOps.MOD))
        }
        spark.range(1).select(concat_ws("_", mins: _*)).head().getString(0)
      }
      assert(bucket(base) === bucket(collider),
        "spec precondition: the pair must share the band-0 bucket")
    }
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.suppressNearDups(src.toDF())
    val q = out.writeStream.format("memory").queryName("nddverify")
      .outputMode("append").start()
    try {
      src.addData(DocEv(t(1), 1, base))
      q.processAllAvailable()
      // batch 2: the collider shares doc 1's bucket but fails the exact
      // verify → emitted; an exact copy of the COLLIDER then arrives and
      // must be suppressed by the second remembered owner (doc 2), proving
      // the bounded owner list verifies against every claimant, not just
      // the first
      src.addData(DocEv(t(11), 2, collider))
      q.processAllAvailable()
      src.addData(DocEv(t(21), 3, collider))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT doc_id FROM nddverify").collect()
        .map(_.getLong(0)).toSet
      assert(emitted === Set(1L, 2L), emitted)
    } finally q.stop()
  }

  test("near-dup blacklist LRU: an evicted claimant's duplicates re-admit") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // same bucket-sharing dissimilar pair as the verify test above
    val base = "alpha beta gamma delta epsilon"
    val collider = "alpha beta gamma delta epsilon zeta eta xi omicron rho digamma"
    val src = MemoryStream[DocEv]
    // maxOwners = 1: every emitted doc evicts the previous claimant
    val out = WindowedStreams.suppressNearDups(src.toDF(), maxOwners = 1)
    val q = out.writeStream.format("memory").queryName("nddlru")
      .outputMode("append").start()
    try {
      src.addData(DocEv(t(1), 1, base)) // claims the bucket
      q.processAllAvailable()
      // dissimilar collider: emitted, and at cap 1 it EVICTS doc 1
      src.addData(DocEv(t(11), 2, collider))
      q.processAllAvailable()
      // exact copy of the current claimant: suppressed (verified match)
      src.addData(DocEv(t(21), 3, collider))
      q.processAllAvailable()
      // exact copy of the EVICTED doc 1: re-admitted — bounded state has
      // forgotten it, the documented LRU recall contract
      src.addData(DocEv(t(31), 4, base))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT doc_id FROM nddlru").collect()
        .map(_.getLong(0)).toSet
      assert(emitted === Set(1L, 2L, 4L), emitted)
    } finally q.stop()
  }

  test("near-dup blacklist LRU: a suppression hit refreshes the claimant's recency") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // three mutually-dissimilar docs sharing the band-0 bucket: base's two
    // minhash minima survive in both supersets (asserted below)
    val base = "alpha beta gamma delta epsilon"
    val collider = "alpha beta gamma delta epsilon zeta eta xi omicron rho digamma"
    val collider2 = "alpha beta gamma delta epsilon zeta eta pi upsilon heta san"
    locally {
      import graft.operators.TextOps
      import org.apache.spark.sql.functions._
      val bucket = (text: String) => {
        val sh = TextOps.shingles(lit(text))
        val mins = TextOps.minhashParams.take(TextOps.MinhashRows).map { case (a, b) =>
          array_min(transform(sh,
            s => (lit(a) * TextOps.weakHash(s) + lit(b)) % TextOps.MOD))
        }
        spark.range(1).select(concat_ws("_", mins: _*)).head().getString(0)
      }
      assert(bucket(base) === bucket(collider) &&
        bucket(base) === bucket(collider2),
        "spec precondition: all three docs must share the band-0 bucket")
    }
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.suppressNearDups(src.toDF(), maxOwners = 2)
    val q = out.writeStream.format("memory").queryName("nddlru2")
      .outputMode("append").start()
    try {
      src.addData(DocEv(t(1), 1, base))        // owners [1]
      q.processAllAvailable()
      src.addData(DocEv(t(11), 2, collider))   // dissimilar → owners [1,2]
      q.processAllAvailable()
      // copy of doc 1: suppressed, and the HIT must move owner 1 to the
      // recent end — owners [2,1]
      src.addData(DocEv(t(21), 3, base))
      q.processAllAvailable()
      // third dissimilar claimant at cap 2: evicts the least-recently-USED
      // owner, which after the refresh is doc 2 (FIFO would evict doc 1)
      src.addData(DocEv(t(31), 4, collider2))  // owners [1,4]
      q.processAllAvailable()
      // copy of doc 1: STILL suppressed (the refresh saved it); copy of
      // doc 2: re-admitted (it was the eviction victim)
      src.addData(DocEv(t(41), 5, base), DocEv(t(42), 6, collider))
      q.processAllAvailable()
      val emitted = spark.sql("SELECT doc_id FROM nddlru2").collect()
        .map(_.getLong(0)).toSet
      assert(emitted === Set(1L, 2L, 4L, 6L), emitted)
    } finally q.stop()
  }

  test("composed curation pipeline: dedup, quality floor, decontaminate, blacklist") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // quality-floor arithmetic (shared formula): each "good" doc carries
    // enough stopwords that 25·n + ⌊5000·ns/n⌋ clears 2500 bp
    val goodA = "the quick brown fox is in the grass and it runs to a tree of the forest"
    val lowQ = "tungsten codegen stages fuse narrow transformations"
    val contaminated = "the answers of the secret benchmark eval suite and it is in a box to keep"
    val nearDupA = goodA + " green hills afar"
    val novelD = "a parade of new ideas is in the air and it moves to the city of lights"
    locally { // precondition: the near-dup shares goodA's band-0 bucket
      import graft.operators.TextOps
      import org.apache.spark.sql.functions._
      val bucket = (text: String) => {
        val sh = TextOps.shingles(lit(text))
        val mins = TextOps.minhashParams.take(TextOps.MinhashRows).map { case (a, b) =>
          array_min(transform(sh,
            s => (lit(a) * TextOps.weakHash(s) + lit(b)) % TextOps.MOD))
        }
        spark.range(1).select(concat_ws("_", mins: _*)).head().getString(0)
      }
      assert(bucket(goodA) === bucket(nearDupA),
        "spec precondition: near-dup must share goodA's band-0 bucket")
    }
    val bench = Seq("secret benchmark eval", "benchmark eval suite").toDF("s")
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.streamCuratePipeline(src.toDF(), bench)
    val q = out.writeStream.format("memory").queryName("curate")
      .outputMode("append").start()
    try {
      src.addData(DocEv(t(1), 1, goodA)) // novel, curated
      q.processAllAvailable()
      src.addData(
        DocEv(t(11), 2, goodA),        // bit-exact copy → stage-1 dedup
        DocEv(t(12), 3, lowQ),         // 150 bp → quality floor
        DocEv(t(13), 4, contaminated), // passes floor, shares a bench shingle
        DocEv(t(14), 5, nearDupA),     // verified band collision → blacklist
        DocEv(t(15), 6, novelD),       // clean and novel → curated
        DocEv(t(16), 7, null))         // unscorable → quality floor
      q.processAllAvailable()
      val emitted = spark.sql("SELECT doc_id FROM curate").collect()
        .map(_.getLong(0)).toSet
      assert(emitted === Set(1L, 6L), emitted)
    } finally q.stop()
  }

  test("near-dup hit log emits (owner, newcomer) pairs for band collisions") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.nearDupHitLog(src.toDF())
    val q = out.writeStream.format("memory").queryName("nddhits")
      .outputMode("append").start()
    try {
      val a = "the quick brown fox jumps over the lazy dog"
      src.addData(DocEv(t(1), 1, a), DocEv(t(2), 2, "unrelated text about " +
        "benchmark contamination screening in large corpora"))
      q.processAllAvailable()
      src.addData(DocEv(t(11), 3, a)) // exact dup of doc 1, one batch later
      q.processAllAvailable()
      val hits = spark.sql(
          "SELECT doc_a, doc_b, band, jaccard_bp FROM nddhits").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .toSet
      // an exact duplicate collides in EVERY band — one logged hit per
      // band, each carrying the exact Jaccard (identical shingle sets =
      // 10000 bp); the expected set renders from the library geometry
      assert(hits === (0 until graft.operators.TextOps.MinhashBands)
        .map(b => (1L, 3L, b, 10000L)).toSet, hits)
    } finally q.stop()
  }

  test("exact-content dedup drops a bit-identical doc arriving in a later batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.dedupExactText(src.toDF())
    val q = out.writeStream.format("memory").queryName("exdedup")
      .outputMode("append").start()
    try {
      val a = "the quick brown fox jumps over the lazy dog"
      src.addData(DocEv(t(1), 1, a), DocEv(t(2), 2, "something else entirely"))
      q.processAllAvailable()
      // batch 2 within the watermark horizon: doc 3 is bit-identical to
      // doc 1 (dropped); doc 4 differs by one char (kept — EXACT, not
      // near); docs 5+6 have null text — BOTH pass through (null keys
      // compare equal in dedup state; without the split doc 6 vanishes)
      src.addData(DocEv(t(3), 3, a), DocEv(t(4), 4, a + "!"),
        DocEv(t(5), 5, null), DocEv(t(6), 6, null))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM exdedup").collect()
        .map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L, 5L, 6L), kept)
    } finally q.stop()
  }

  test("streaming decontamination drops docs sharing a benchmark shingle") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val bench = Seq("the quick brown", "quick brown fox").toDF("s")
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.decontaminate(src.toDF(), bench)
    val q = out.writeStream.format("memory").queryName("decon")
      .outputMode("append").start()
    try {
      src.addData(
        DocEv(t(1), 1, "the quick brown fox jumps"),   // hits -> dropped
        DocEv(t(2), 2, "a clean training document here"), // no hit -> kept
        DocEv(t(3), 3, "too short"))                   // no shingles -> kept
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM decon").collect()
        .map(_.getLong(0)).toSet
      assert(kept === Set(2L, 3L), kept)
    } finally q.stop()
  }

  test("sliding windows assign one event to len/slide windows") {
    // batch-mode check of assignment arithmetic (no state needed)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Ev(t(7), "a", 1.0)).toDF()
    val out = WindowedStreams.sliding(df, "ts", "k", "10 minutes",
      "5 minutes", "1 minute")
    val starts = out.collect().map(_.getTimestamp(0).toString).sorted
    assert(starts === Array("2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0"))
  }

  test("embedding near-dup suppressor drops a cosine-duplicate vector arriving later") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // state API v2 needs the RocksDB provider; scope it to this query
    val overrides = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true",
      "spark.sql.shuffle.partitions" -> "2")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val src = MemoryStream[(Timestamp, Long, Seq[Float])]
      // ε = 0.005 keeps the perturbed vector on the same side of every
      // SRP hyperplane (|w_0| ≥ 25 ≫ ε·|w_1| ≤ 3.4 for the first 8
      // planes), so same bucket AND cosine ≈ 0.99999 ≥ 0.9
      val a  = Seq(1f, 0f, 0f, 0f)
      val a2 = Seq(1f, 0.005f, 0f, 0f)
      val a3 = Seq(1f, 0f, 0.005f, 0f)
      val b  = Seq(0f, 1f, 0f, 0f) // orthogonal: novel wherever it lands
      // 3-dim twin of `a`: the zero 4th component means it projects onto
      // every SRP hyperplane exactly like `a` (same bucket), and its
      // 3-dim PREFIX cosine vs `a` is 1.0 — so it pins the dimension
      // guard: a dimension-mismatched vector must be treated as novel,
      // never suppressed on a prefix match
      val short3 = Seq(1f, 0f, 0f)
      // the drain factory IS the test-mode contract (TimeMode.None)
      val out = WindowedStreams.suppressEmbedNearDupsDrain(
        src.toDF().toDF("ts", "vec_id", "embedding"))
      val q = out.writeStream.format("memory").queryName("embdedup")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-embdedup").toString)
        .start()
      src.addData((t(1), 1L, a))
      q.processAllAvailable()
      src.addData((t(2), 2L, a2), (t(3), 3L, b)) // 2 suppressed, 3 novel
      q.processAllAvailable()
      src.addData((t(4), 4L, a3)) // still a dup of the batch-1 claimant
      q.processAllAvailable()
      src.addData((t(5), 5L, short3)) // dim mismatch: novel, not a prefix-dup
      q.processAllAvailable()
      q.stop()
      val emitted = spark.sql("SELECT vec_id FROM embdedup").collect()
        .map(_.getLong(0)).toSet
      assert(emitted === Set(1L, 3L, 5L), emitted)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("near-dup blacklist survives a restart: recovered state suppresses post-restart duplicates") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    // X1 for the near-dup blacklist: parquet sink (the memory sink does
    // not support checkpoint recovery), versioned checkpoint dir, stop,
    // NEW MemoryStream + query from the same checkpoint — batch 0 replays
    // (MemoryStream offsets), then a post-restart duplicate of the
    // RECOVERED claimant must be suppressed and batch 0 not double-written
    val root = java.nio.file.Files.createTempDirectory("graft-ndrestart").toString
    val sink = java.nio.file.Files.createTempDirectory("graft-ndsink").toString
    val cp = WindowedStreams.versionedCheckpoint(root, "suppressNearDups")
    val src1 = MemoryStream[DocEv]
    val q1 = WindowedStreams.suppressNearDups(
        src1.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      src1.addData(DocEv(t(1), 1L, "alpha beta gamma delta epsilon"))
      q1.processAllAvailable()
    } finally q1.stop()
    val src2 = MemoryStream[DocEv]
    src2.addData(DocEv(t(1), 1L, "alpha beta gamma delta epsilon")) // replayed batch 0
    val q2 = WindowedStreams.suppressNearDups(
        src2.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", cp).outputMode("append").start()
    try {
      src2.addData(
        DocEv(t(2), 2L, "alpha beta gamma delta epsilon"), // dup of recovered claimant
        DocEv(t(3), 3L, "one two three four five six"))    // novel
      q2.processAllAvailable()
    } finally q2.stop()
    val emitted = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(emitted === Seq(1L, 3L), emitted)
  }

  test("versioned checkpoint: restart across a state-schema change fails loudly, not in the state store") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cpver").toString
    // run a REAL checkpointed instance of the operator first, so the
    // guard is exercised against a directory a streaming query owns
    val src = MemoryStream[DocEv]
    val out = WindowedStreams.suppressNearDups(
      src.toDF().toDF("ts", "doc_id", "text"))
    val cp = WindowedStreams.versionedCheckpoint(root, "suppressNearDups")
    val q = out.writeStream.format("memory").queryName("cpver")
      .outputMode("append").option("checkpointLocation", cp).start()
    try {
      src.addData(DocEv(t(1), 1L, "alpha beta gamma delta"))
      q.processAllAvailable()
    } finally q.stop()
    // same build, same version → resolves to the same directory, no error
    assert(WindowedStreams.versionedCheckpoint(root, "suppressNearDups") === cp)
    // simulate a checkpoint written under a DIFFERENT schema version
    // (an old build's directory copied/renamed into the current path):
    // the restart must die at resolution time with instructions, never
    // reach state deserialization. Rewrite THROUGH the Hadoop FS (as the
    // old build would have) so the local-FS checksum sidecar stays valid.
    locally {
      import org.apache.hadoop.fs.Path
      val mk = new Path(cp, "_graft_state_version")
      val fs = mk.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = fs.create(mk, true)
      try out.write("1".getBytes("UTF-8")) finally out.close()
    }
    val e = intercept[IllegalStateException] {
      WindowedStreams.versionedCheckpoint(root, "suppressNearDups")
    }
    assert(e.getMessage.contains("state-schema v1"), e.getMessage)
    assert(e.getMessage.contains("fresh"), e.getMessage)
    // unknown operators are rejected rather than silently unversioned
    intercept[IllegalArgumentException] {
      WindowedStreams.versionedCheckpoint(root, "nope")
    }
    // a MARKER-LESS directory that already contains checkpoint structure
    // (pre-versioning build, or a copy that lost the marker) is of
    // unknown schema: stamping it would defer the failure into the state
    // store — it must be rejected loudly instead
    val legacy = java.nio.file.Files.createTempDirectory("graft-cplegacy")
    val legacyDir = java.nio.file.Paths.get(
      legacy.toString, "suppressNearDups-v2")
    java.nio.file.Files.createDirectories(legacyDir.resolve("offsets"))
    val e2 = intercept[IllegalStateException] {
      WindowedStreams.versionedCheckpoint(legacy.toString, "suppressNearDups")
    }
    assert(e2.getMessage.contains("no suppressNearDups state-schema marker"),
      e2.getMessage)
    // a version BUMP lands in a fresh directory (never a mismatch):
    // distinct ops resolve to distinct dirs as a proxy for distinct
    // versions of one op
    val other = WindowedStreams.versionedCheckpoint(root, "suppressEmbedNearDups")
    assert(other !== cp)
  }

  test("versioned checkpoint: concurrent resolution of the same fresh dir never surfaces a raw FS error") {
    // two queries of the same build may resolve the same fresh root at
    // once (e.g. a restart supervisor relaunching both halves of a
    // topology): exactly one thread wins the non-overwriting marker
    // create; every loser must fall through to validating the winner's
    // marker — same-version, so everyone returns the same path and
    // nobody sees FileAlreadyExistsException. Hammer across fresh roots
    // so the exists→create window is actually contended.
    import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(8)
    try {
      (1 to 20).foreach { _ =>
        val root = java.nio.file.Files.createTempDirectory("graft-cprace").toString
        val barrier = new CyclicBarrier(8)
        val futs = (1 to 8).map { _ =>
          pool.submit(new java.util.concurrent.Callable[String] {
            def call(): String = {
              barrier.await(30, TimeUnit.SECONDS)
              WindowedStreams.versionedCheckpoint(root, "suppressNearDups")
            }
          })
        }
        val paths = futs.map(_.get(60, TimeUnit.SECONDS)).toSet
        assert(paths.size === 1, paths)
      }
    } finally pool.shutdownNow()
  }

  test("incremental dedup stream: frozen-corpus verdicts match the batch op, restart resumes at the next increment") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.TextOps

    val seen = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red orange yellow green blue indigo")).toDF("doc_id", "text")
    val idx = TextOps.seenIndexOf(seen).persist()
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Option[Long], Boolean)])]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, id) => {
      val rows = df.collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toSet
      results.synchronized { results += ((id, rows)) }
    }
    val cp = java.nio.file.Files.createTempDirectory("graft-incdedup").toString

    val inc1 = Seq(
      FreshDoc(101L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      FreshDoc(102L, "one two three four five six eight"),   // near-dup of 2
      FreshDoc(103L, "completely novel text with unique distinct words"))
    val src1 = MemoryStream[FreshDoc]
    src1.addData(inc1: _*)
    val q1 = WindowedStreams.dedupIncrementalStream(src1.toDF(), idx, cp, sink)
    q1.awaitTermination() // AvailableNow: drains increment 1, stops

    // restart: NEW source replays increment 1 at the same offsets, adds
    // increment 2 — the committed batch must NOT re-reach the sink
    val inc2 = Seq(
      FreshDoc(104L, "red orange yellow green blue indigo"), // exact dup of 3
      FreshDoc(105L, "alpha beta gamma delta epsilon eta"))  // near-dup of 1
    val src2 = MemoryStream[FreshDoc]
    src2.addData(inc1: _*)
    src2.addData(inc2: _*)
    val q2 = WindowedStreams.dedupIncrementalStream(src2.toDF(), idx, cp, sink)
    q2.awaitTermination()

    assert(results.map(_._1).toSeq === Seq(0L, 1L), results)
    // exact-path verdicts are deterministic outright
    val byDoc = results.flatMap(_._2).map(r => r._1 -> r).toMap
    assert(byDoc(101L) === ((101L, Some(1L), false)))
    assert(byDoc(104L) === ((104L, Some(3L), false)))
    assert(byDoc(103L) === ((103L, None, true)))
    // THE pin: batching-invariance — the union of micro-batch outputs
    // equals one batch dedupIncrementalOf run over all fresh docs
    val batchTwin = TextOps.dedupIncrementalOf((inc1 ++ inc2).toDF(), seen)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toSet
    assert(results.flatMap(_._2).toSet === batchTwin)
    idx.unpersist()
  }

  test("incremental dedup stream with containment: quoted-inside dups are suppressed, restart resumes, batch parity holds") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.TextOps

    // seen doc 1 is a 24-token passage; seen doc 2 is 7 tokens (below the
    // 8-token window width — it contributes NO span windows, so matching
    // it exercises the no-window fresh/seen edge through the left joins)
    val seen = Seq(
      (1L, (1 to 24).map(i => f"t$i%02d").mkString(" ")),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val idx = TextOps.seenIndexOf(seen).persist()
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Option[Long], Boolean)])]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, id) => {
      val rows = df.collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toSet
      results.synchronized { results += ((id, rows)) }
    }
    val cp = java.nio.file.Files.createTempDirectory("graft-incctn").toString

    // 201 quotes tokens 5..16 of seen doc 1 verbatim: all 5 of its 8-token
    // windows are contained (containment = 1 ≥ 1/2) while its shingle
    // Jaccard vs doc 1 is 10/22 ≈ 0.45 < 0.5 — the near-dup and exact
    // modalities BOTH miss it. THE pin: without containment this doc
    // passes unsuppressed (asserted on the batch twin below).
    val inc1 = Seq(
      FreshDoc(201L, (5 to 16).map(i => f"t$i%02d").mkString(" ")),
      FreshDoc(202L, "novel unique distinct phrases nothing matching anything whatsoever"))
    val src1 = MemoryStream[FreshDoc]
    src1.addData(inc1: _*)
    val q1 = WindowedStreams.dedupIncrementalStream(src1.toDF(), idx, cp, sink,
      containment = true)
    q1.awaitTermination()

    // restart: NEW source replays increment 1 at the same offsets, adds
    // increment 2 — the committed batch must NOT re-reach the sink
    val inc2 = Seq(
      FreshDoc(203L, (1 to 24).map(i => f"t$i%02d").mkString(" ")), // exact dup of 1
      FreshDoc(204L, "one two three four five six seven")) // exact dup of 2, no windows
    val src2 = MemoryStream[FreshDoc]
    src2.addData(inc1: _*)
    src2.addData(inc2: _*)
    val q2 = WindowedStreams.dedupIncrementalStream(src2.toDF(), idx, cp, sink,
      containment = true)
    q2.awaitTermination()

    assert(results.map(_._1).toSeq === Seq(0L, 1L), results)
    val byDoc = results.flatMap(_._2).map(r => r._1 -> r).toMap
    assert(byDoc(201L) === ((201L, Some(1L), false)), "containment verdict")
    assert(byDoc(202L) === ((202L, None, true)))
    assert(byDoc(203L) === ((203L, Some(1L), false)))
    assert(byDoc(204L) === ((204L, Some(2L), false)), "windowless exact dup")
    // batching-invariance: union of micro-batch outputs == one batch run
    val allFresh = (inc1 ++ inc2).toDF()
    val batchTwin = TextOps.dedupIncrementalOf(allFresh, seen,
        containment = true)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2))).toSet
    assert(results.flatMap(_._2).toSet === batchTwin)
    // and the un-extended op really does let the quoted-inside dup through
    val without = TextOps.dedupIncrementalOf(allFresh, seen)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(without(201L) === true,
      "quoted-inside dup must pass unsuppressed without the containment modality")
    idx.unpersist()
  }

  test("cluster-report stream: update-mode components merge across batches, restart resumes, batch parity holds") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.TextOps

    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long)])]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, id) => {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      results.synchronized { results += ((id, rows)) }
    }
    val cp = java.nio.file.Files.createTempDirectory("graft-crs-cp").toString
    val store = java.nio.file.Files.createTempDirectory("graft-crs-st").toString

    // batch 1: two corroborated components {1,2} and {3,4}; (5,6) has
    // only one agreeing modality and must NOT enter the graph
    val inc1 = Seq(RPair(1L, 2L, 2L), RPair(3L, 4L, 3L), RPair(5L, 6L, 1L))
    val src1 = MemoryStream[RPair]
    src1.addData(inc1: _*)
    val q1 = WindowedStreams.clusterReportStream(src1.toDF(), cp, store, sink)
    q1.awaitTermination()
    assert(results.map(_._1).toSeq === Seq(0L))
    assert(results.head._2 ===
      Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)))

    // restart: replay batch 1 at the same offsets (must not re-reach the
    // sink), add batch 2 — (2,3) MERGES the two prior components via the
    // store's star edges, (7,8) opens a new one
    val inc2 = Seq(RPair(2L, 3L, 2L), RPair(7L, 8L, 2L))
    val src2 = MemoryStream[RPair]
    src2.addData(inc1: _*)
    src2.addData(inc2: _*)
    val q2 = WindowedStreams.clusterReportStream(src2.toDF(), cp, store, sink)
    q2.awaitTermination()

    assert(results.map(_._1).toSeq === Seq(0L, 1L))
    // update-mode: the final sink state is EVERY streamed doc's current
    // rep — the cross-batch merge relabels 3 and 4 to rep 1
    val finalLabels = results.last._2
    assert(finalLabels === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (7L, 7L), (8L, 7L)))
    // batching-invariance: the store after the last batch equals one
    // batch components run over the union of all corroborated pairs
    val batchTwin = TextOps.dedupClustersFromPairs(
        (inc1 ++ inc2).toDF()
          .filter(col("n_modalities") >= TextOps.ReportClusterMinModalities)
          .select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalLabels === batchTwin)
    // store hygiene: versions pruned to at most two
    val kept = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted
    assert(kept.length <= 2, s"store not pruned: ${kept.toSeq}")

    // CHECKPOINT RESET (not restart): a brand-new checkpoint dir restarts
    // batch ids at 0, but the label store must RESUME from its newest
    // committed version — not ignore it, and above all not prune it away
    // (the meta record decouples store versions from batch ids)
    val cp2 = java.nio.file.Files.createTempDirectory("graft-crs-cp2").toString
    val src3 = MemoryStream[RPair]
    src3.addData(RPair(8L, 9L, 2L)) // extends the {7,8} component
    val q3 = WindowedStreams.clusterReportStream(src3.toDF(), cp2, store, sink)
    q3.awaitTermination()
    assert(results.map(_._1).toSeq === Seq(0L, 1L, 0L))
    assert(results.last._2 === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (7L, 7L), (8L, 7L), (9L, 7L)),
      s"fresh-checkpoint run lost or ignored the store: ${results.last._2}")
  }

  test("cluster-report stream: checkpoint reset after a batch-0-only run is NOT a crash replay (run token disambiguates)") {
    // The ambiguous case batch ids alone cannot resolve: run 1 stops
    // after processing ONLY batch 0 (meta records batch=0), then the
    // streaming checkpoint is reset, so run 2's first batch is ALSO id 0.
    // Without the per-run token, run 2's batch 0 matches the stored meta
    // batch id, is misclassified as a crash replay, reuses the stored
    // version, and folds from that version's PRIOR (the empty store) —
    // silently dropping run 1's committed pairs from the label store.
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, Long)])]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, id) => {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      results.synchronized { results += ((id, rows)) }
    }
    val store = java.nio.file.Files.createTempDirectory("graft-crs2-st").toString

    // run 1: one batch (id 0) folds {1,2}
    val cp1 = java.nio.file.Files.createTempDirectory("graft-crs2-cp1").toString
    val src1 = MemoryStream[RPair]
    src1.addData(RPair(1L, 2L, 2L))
    val q1 = WindowedStreams.clusterReportStream(src1.toDF(), cp1, store, sink)
    q1.awaitTermination()
    assert(results.map(_._1).toSeq === Seq(0L))
    assert(results.head._2 === Set((1L, 1L), (2L, 1L)))

    // checkpoint reset: run 2's batch id restarts at 0 — it must ADVANCE
    // on top of the committed store, so run 1's {1,2} fold survives
    val cp2 = java.nio.file.Files.createTempDirectory("graft-crs2-cp2").toString
    val src2 = MemoryStream[RPair]
    src2.addData(RPair(3L, 4L, 2L))
    val q2 = WindowedStreams.clusterReportStream(src2.toDF(), cp2, store, sink)
    q2.awaitTermination()
    assert(results.map(_._1).toSeq === Seq(0L, 0L))
    assert(results.last._2 === Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)),
      s"batch-0-to-batch-0 reset dropped the first run's fold: ${results.last._2}")
  }
}
