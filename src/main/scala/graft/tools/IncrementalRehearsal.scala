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
  *    actual cached footprint (memory + disk) from the block manager:
  *    the STATE a long-lived dedup service pins per corpus shard.
  *  - `increment_s` — wall for one full increment verdict pass (exact +
  *    MinHash/Jaccard + containment) against the pinned artifacts; the
  *    recurring cost, and the number that must stay flat as the corpus
  *    (not the increment) grows, because every join is bucket- and
  *    candidate-bounded on the frozen side.
  *
  * Usage: runMain graft.tools.IncrementalRehearsal <corpusDir> <freshDir>
  *        [out.json]   (e.g. /tmp/testdata/sf1 /root/testdata/sf0.01)
  * Fresh doc_ids are shifted by 10^9 so the two directories can never
  * alias. */
object IncrementalRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IncrementalRehearsal <corpusDir> <freshDir> [out.json]")
    val (corpusDir, freshDir) = (args(0), args(1))
    val spark = Engine.session()
    try {
      val seen = spark.read.parquet(s"$corpusDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val fresh = spark.read.parquet(s"$freshDir/documents.parquet")
        .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"))
      val nSeen = seen.count()
      val nFresh = fresh.count()

      val t0 = System.nanoTime()
      val idx = TextOps.seenIndexOf(seen).persist()
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
      val out = verdicts.groupBy("kept").count().collect()
        .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val incS = (System.nanoTime() - t1) / 1e9

      // streaming twin: the same increment through
      // dedupIncrementalStream in 5 micro-batches against the SAME
      // pinned index — the production crawl-ingest cadence; per-batch
      // cost must stay flat because every join is bucket/candidate-
      // bounded on the frozen side
      implicit val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING)
      val rowsLocal = fresh.collect().map(r => (r.getLong(0), r.getString(1)))
      val src = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](enc, spark)
      rowsLocal.grouped(math.max(rowsLocal.length / 5, 1))
        .foreach(g => src.addData(g.toSeq))
      val seenCount = new java.util.concurrent.atomic.AtomicLong()
      val cp = java.nio.file.Files.createTempDirectory("graft-increhcp").toString
      val t2 = System.nanoTime()
      val q = graft.streaming.WindowedStreams.dedupIncrementalStream(
        src.toDF().toDF("doc_id", "text"), idx, cp,
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
        s"""{"metric":"incremental_rehearsal","n_seen":$nSeen,""" +
          s""""n_fresh":$nFresh,"index_build_s":${num(buildS, "%.3f")},""" +
          rows.map { case (k, v) => s""""rows_$k":$v""" }.mkString(",") +
          s""","index_cached_mb":${num(cachedMb, "%.1f")},""" +
          s""""increment_s":${num(incS, "%.3f")},""" +
          s""""stream_5batches_s":${num(streamS, "%.3f")},""" +
          s""""kept":${out.getOrElse(true, 0L)},""" +
          s""""dropped":${out.getOrElse(false, 0L)}}"""
      println(json)
      args.lift(2).foreach(p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
      idx.unpersist()
    } finally spark.stop()
  }
}
