package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.operators.TextOps
import graft.streaming.WindowedStreams

/** sf1-scale restart drive for [[WindowedStreams.clusterReportStream]]
  * (round-12 VERDICT item 6): the spec pins merge/restart/parity on
  * hand-rolled fixtures; this tool drives the SAME invariants with the
  * real mined corroborated pair graph at a given scale, a mid-stream
  * kill, and a fresh-checkpoint resume, so the versioned label store's
  * pruning and replay arms are exercised under real batch counts.
  *
  * Sequence:
  *   1. mine `dedupReport(sfDir)`, split the pair relation into
  *      `nFiles` parquet files — a file streaming source with
  *      maxFilesPerTrigger=1 turns each into one micro-batch;
  *   2. run 1: start the stream, KILL it (query.stop()) after
  *      `killAfter` sink deliveries — a mid-stream crash. Depending on
  *      where the stop lands this leaves either a committed batch whose
  *      offsets never committed (→ re-delivered) or a half-written
  *      uncommitted v= dir (→ version number reused);
  *   3. run 2: SAME checkpoint — Structured Streaming re-delivers from
  *      the first uncommitted offset under a NEW run token, so any
  *      replayed batch takes the documented idempotent advance path;
  *      drains the remaining files;
  *   4. run 3: FRESH checkpoint over one extra pair file — batch ids
  *      restart at 0 and the store must resume, not reset;
  *   5. verify: final store labels == one batch
  *      [[TextOps.dedupClustersFromPairs]] run over ALL corroborated
  *      pairs, and the store holds ≤ 2 committed versions.
  *
  * Usage: runMain graft.tools.ClusterStreamRehearsal
  * (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_OUT). */
object ClusterStreamRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out/cluster_stream_rehearsal.json")
    val nFiles = 8
    val killAfter = 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-csr").toString
    val mainDir = s"$work/pairs_main"
    val extraDir = s"$work/pairs_extra"
    val cp1 = s"$work/cp1"
    val cp2 = s"$work/cp2"
    val store = s"$work/store"

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 1. the real corroborated pair graph at this scale, split so the
    // file source delivers nFiles micro-batches; one pair is held out
    // as the fresh-checkpoint run's increment
    var mineS = 0.0
    var pairCount = 0L
    mineS = time {
      val report = TextOps.dedupReport(spark, sfDir)
        .select(col("doc_a"), col("doc_b"), col("n_modalities"))
        .persist()
      pairCount = report.count()
      val corroborated =
        report.filter(col("n_modalities") >= TextOps.ReportClusterMinModalities)
      val one = corroborated.orderBy(col("doc_a"), col("doc_b")).limit(1)
      corroborated.exceptAll(one)
        .repartition(nFiles).write.mode("overwrite").parquet(mainDir)
      one.write.mode("overwrite").parquet(extraDir)
      report.unpersist(true)
    }

    val deliveries = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var lastLabels: Array[(Long, Long)] = Array.empty
    val sink: (DataFrame, Long) => Unit = (df, _) => {
      lastLabels = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      deliveries.incrementAndGet()
    }
    val schema = spark.read.parquet(mainDir).schema
    def source(dir: String): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)

    // 2. run 1 with a mid-stream kill: stop() from a watcher thread once
    // killAfter batches have reached the sink — the stop lands wherever
    // it lands (between batches, or inside a fold before/after the
    // parquet commit), which is the point
    val run1S = time {
      val q = WindowedStreams.clusterReportStream(
        source(mainDir), cp1, store, sink)
      val watcher = new Thread(() => {
        while (q.isActive && deliveries.get() < killAfter) Thread.sleep(50)
        if (q.isActive) q.stop()
      })
      watcher.setDaemon(true)
      watcher.start()
      try q.awaitTermination()
      catch { case _: StreamingQueryException => () } // the kill
      watcher.join()
    }
    val run1Deliveries = deliveries.get()

    // 3. run 2, same checkpoint: re-delivers any uncommitted batch under
    // a new run token (advance path, idempotent) and drains the rest
    val run2S = time {
      WindowedStreams.clusterReportStream(
        source(mainDir), cp1, store, sink).awaitTermination()
    }
    val afterMain = lastLabels.toSet

    // 4. run 3, FRESH checkpoint, one extra pair: ids restart at 0; the
    // store must advance on top of its newest committed version
    val run3S = time {
      WindowedStreams.clusterReportStream(
        source(extraDir), cp2, store, sink).awaitTermination()
    }

    // 5. parity vs the batch op over ALL corroborated pairs, and pruning
    val batchTwin = TextOps.dedupClustersFromPairs(
        spark.read.parquet(mainDir).unionByName(spark.read.parquet(extraDir))
          .select(col("doc_a"), col("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = lastLabels.toSet
    val parity = streamed == batchTwin
    val versionDirs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("v=")).map(_.getName).sorted.toSeq
    val pruned = versionDirs.length <= 2
    require(parity, s"stream/batch parity FAILED: streamed=${streamed.size} " +
      s"batch=${batchTwin.size} diff=${(streamed diff batchTwin).take(5)} " +
      s"${(batchTwin diff streamed).take(5)}")
    require(pruned, s"store not pruned to <=2 versions: $versionDirs")

    val json = f"""{"tool":"cluster_stream_rehearsal","sf":"$sfDir",""" +
      f""""cpus":$cpus,"report_pairs":$pairCount,""" +
      f""""files":$nFiles,"kill_after_deliveries":$killAfter,""" +
      f""""run1_deliveries":$run1Deliveries,""" +
      f""""total_deliveries":${deliveries.get()},""" +
      f""""mine_s":$mineS%.3f,"run1_killed_s":$run1S%.3f,""" +
      f""""run2_resume_s":$run2S%.3f,"run3_fresh_ckpt_s":$run3S%.3f,""" +
      f""""labels":${streamed.size},"after_main_labels":${afterMain.size},""" +
      f""""parity":$parity,"versions_kept":${versionDirs.length}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
