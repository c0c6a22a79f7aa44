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

      // Locale.ROOT: JSON must stay parseable under comma-decimal locales
      def num(v: Double, p: String) =
        String.format(java.util.Locale.ROOT, p, Double.box(v))
      val json =
        s"""{"metric":"incremental_rehearsal","n_seen":$nSeen,""" +
          s""""n_fresh":$nFresh,"index_build_s":${num(buildS, "%.3f")},""" +
          rows.map { case (k, v) => s""""rows_$k":$v""" }.mkString(",") +
          s""","index_cached_mb":${num(cachedMb, "%.1f")},""" +
          s""""increment_s":${num(incS, "%.3f")},""" +
          s""""kept":${out.getOrElse(true, 0L)},""" +
          s""""dropped":${out.getOrElse(false, 0L)}}"""
      println(json)
      args.lift(2).foreach(p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n"))
      idx.unpersist()
    } finally spark.stop()
  }
}
