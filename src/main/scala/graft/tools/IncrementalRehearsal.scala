package graft.tools

import graft.Engine
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Scale rehearsal for the flagship 100 TB dedup shape: a SMALL fresh
  * increment deduplicated against a LARGE frozen corpus (realistic
  * increment:corpus ratio, e.g. 500 docs against 50 k = 1:100 — prior
  * rounds only measured 1:1 fixtures). Reports, as one JSON line:
  *
  *  - `index_build_s` — wall to materialize the corpus's four ingest-time
  *    artifacts ([[TextOps.SeenIndex]]: md5 list, MinHash band index,
  *    shingle sets, df-capped span sets). In production this cost is paid
  *    ONCE at ingest and amortized over every later increment; it is
  *    reported separately for exactly that reason.
  *  - `index_rows` / `index_cached_mb` — artifact row counts and the
  *    actual pinned footprint from the block manager: the STATE a
  *    long-lived dedup service holds per corpus shard. In `disk` mode
  *    (round-10 VERDICT item 6) the artifacts are written as a parquet
  *    snapshot ([[TextOps.writeSeenIndex]]) and read back — pinned
  *    memory is ~0 and the build time includes the snapshot write.
  *  - `increment_s` — wall for one full increment verdict pass (exact +
  *    MinHash/Jaccard + containment) against the artifacts; the
  *    recurring cost, and the number that must stay flat as the corpus
  *    (not the increment) grows, because every join is bucket- and
  *    candidate-bounded on the frozen side.
  *  - SEEDED DUPLICATES (round-10 VERDICT item 4 — the round-9
  *    rehearsal timed an increment with `dropped: 0`, leaving the
  *    verify stage's cost at realistic dup density unmeasured): a
  *    `seedFrac` fraction of the increment is replaced with documents
  *    derived from the corpus — one third exact copies, one third
  *    near-dups (two appended tokens, Jaccard ≥ 0.5 by construction),
  *    one third contained (verbatim 60 % token prefix of a long corpus
  *    doc). Per-class kept/dropped counts are reported and the
  *    deterministic classes asserted: every exact seed MUST drop via
  *    the hash path; near/contained catch rates are probabilistic
  *    (banding / df caps) and reported as measured.
  *
  * Usage: runMain graft.tools.IncrementalRehearsal <corpusDir> <freshDir>
  *        [out.json] [mode=mem|disk] [seedFrac=0.06]
  * Fresh doc_ids are shifted by 10^9 (seeded dups by 2·10^9) so id
  * spaces can never alias. */
object IncrementalRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IncrementalRehearsal <corpusDir> <freshDir> [out.json] " +
        "[mode=mem|disk] [seedFrac]")
    val (corpusDir, freshDir) = (args(0), args(1))
    val mode = args.lift(3).getOrElse("mem")
    val seedFrac = args.lift(4).map(_.toDouble).getOrElse(0.06)
    val spark = Engine.session()
    val cp = java.nio.file.Files.createTempDirectory("graft-increhcp")
    // disk-mode index snapshot dir, created lazily; deleted in the same
    // finally as the checkpoint tree (it leaked across runs before)
    var snapDir: Option[java.nio.file.Path] = None
    try {
      val seen = spark.read.parquet(s"$corpusDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val freshBase = spark.read.parquet(s"$freshDir/documents.parquet")
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"))
      val nSeen = seen.count()
      val nFreshBase = freshBase.count()

      // ---- seeded duplicates, derived deterministically from the corpus
      val nSeed = math.max((nFreshBase * seedFrac).toLong, 3L)
      val perClass = nSeed / 3
      // distinct corpus sample rows, longest-first so the contained
      // class has enough tokens for a ≥ 8-token window prefix
      val sample = seen
        .withColumn("n_tok", size(split(col("text"), " ")))
        .filter(col("n_tok") >= 20)
        .orderBy(col("doc_id"))
        .limit((3 * perClass).toInt)
        .collect()
      require(sample.length == 3 * perClass,
        s"corpus sample too small: ${sample.length} < ${3 * perClass}")
      import spark.implicits._
      val exactSeeds = sample.take(perClass.toInt).zipWithIndex.map {
        case (r, i) => (2000000000L + i, r.getString(1)) }
      val nearSeeds = sample.slice(perClass.toInt, 2 * perClass.toInt)
        .zipWithIndex.map { case (r, i) =>
          (2100000000L + i, r.getString(1) + " zq1 zq2") }
      val containedSeeds = sample.slice(2 * perClass.toInt, 3 * perClass.toInt)
        .zipWithIndex.map { case (r, i) =>
          val toks = r.getString(1).split(" ")
          (2200000000L + i, toks.take(math.max(toks.length * 3 / 5, 9))
            .mkString(" ")) }
      val seeds = (exactSeeds ++ nearSeeds ++ containedSeeds).toSeq
        .toDF("doc_id", "text")
      // replace nSeed of the base increment with the seeds (constant size)
      val fresh = freshBase
        .orderBy(col("doc_id")).limit((nFreshBase - 3 * perClass).toInt)
        .unionAll(seeds)
      val nFresh = fresh.count()

      val t0 = System.nanoTime()
      val idx0 = TextOps.seenIndexOf(seen)
      val idx = mode match {
        case "disk" =>
          val snap = java.nio.file.Files.createTempDirectory("graft-seenidx")
          snapDir = Some(snap)
          TextOps.writeSeenIndex(idx0, snap.toString)
          TextOps.readSeenIndex(spark, snap.toString)
        case _ => idx0.persist()
      }
      val rows = Map(
        "hashes" -> idx.hashes.count(),
        "buckets" -> idx.buckets.count(),
        "shingle_sets" -> idx.shingleSets.count(),
        "span_sets" -> idx.spanSets.count())
      val buildS = (System.nanoTime() - t0) / 1e9
      val cachedMb = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum / 1e6

      val t1 = System.nanoTime()
      val verdicts = TextOps.dedupIncrementalAgainst(fresh, idx,
        containment = true)
        .withColumn("seed_class",
          when(col("doc_id") >= 2200000000L, "contained")
            .when(col("doc_id") >= 2100000000L, "near")
            .when(col("doc_id") >= 2000000000L, "exact")
            .otherwise("base"))
      val byClass = verdicts.groupBy("seed_class", "kept").count().collect()
        .map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
      val incS = (System.nanoTime() - t1) / 1e9
      def cls(c: String, kept: Boolean) = byClass.getOrElse((c, kept), 0L)
      // deterministic class: exact copies must ALL drop via the md5 path
      require(cls("exact", true) == 0L && cls("exact", false) == perClass,
        s"exact seeds escaped: kept=${cls("exact", true)}")

      // streaming twin: the same increment through
      // dedupIncrementalStream in 5 micro-batches against the SAME
      // index — the production crawl-ingest cadence; per-batch cost must
      // stay flat because every join is bucket/candidate-bounded on the
      // frozen side
      implicit val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING)
      val rowsLocal = fresh.collect().map(r => (r.getLong(0), r.getString(1)))
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](enc, spark)
      rowsLocal.grouped(math.max(rowsLocal.length / 5, 1))
        .foreach(g => src.addData(g.toSeq))
      val seenCount = new java.util.concurrent.atomic.AtomicLong()
      val t2 = System.nanoTime()
      val q = graft.streaming.WindowedStreams.dedupIncrementalStream(
        src.toDF().toDF("doc_id", "text"), idx, cp.toString,
        (df, _) => seenCount.addAndGet(df.count()): Unit,
        containment = true)
      q.awaitTermination()
      val streamS = (System.nanoTime() - t2) / 1e9
      require(seenCount.get() == rowsLocal.length,
        s"stream verdicts ${seenCount.get()} != increment ${rowsLocal.length}")

      // Locale.ROOT: JSON must stay parseable under comma-decimal locales
      def num(v: Double, p: String) =
        String.format(java.util.Locale.ROOT, p, Double.box(v))
      val json =
        s"""{"metric":"incremental_rehearsal","mode":"$mode","n_seen":$nSeen,""" +
          s""""n_fresh":$nFresh,"n_seeded":${3 * perClass},""" +
          s""""index_build_s":${num(buildS, "%.3f")},""" +
          rows.map { case (k, v) => s""""rows_$k":$v""" }.mkString(",") +
          s""","index_cached_mb":${num(cachedMb, "%.1f")},""" +
          s""""increment_s":${num(incS, "%.3f")},""" +
          s""""stream_5batches_s":${num(streamS, "%.3f")},""" +
          s""""kept":${cls("base", true) + cls("exact", true) +
            cls("near", true) + cls("contained", true)},""" +
          s""""dropped":${cls("base", false) + cls("exact", false) +
            cls("near", false) + cls("contained", false)},""" +
          s""""seed_exact_dropped":${cls("exact", false)},""" +
          s""""seed_near_dropped":${cls("near", false)},""" +
          s""""seed_near_kept":${cls("near", true)},""" +
          s""""seed_contained_dropped":${cls("contained", false)},""" +
          s""""seed_contained_kept":${cls("contained", true)}}"""
      println(json)
      args.lift(2).foreach(p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
      if (mode != "disk") idx.unpersist()
    } finally {
      // round-10 ADVICE: the checkpoint tree (and the disk-mode index
      // snapshot) must not accumulate across rehearsal runs
      def rmTree(root: java.nio.file.Path): Unit =
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(root).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }
      rmTree(cp)
      snapDir.foreach(rmTree)
      spark.stop()
    }
  }
}
