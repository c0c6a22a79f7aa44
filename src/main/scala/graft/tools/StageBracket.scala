package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{EventOps, TextOps}

/** Per-STAGE contention bracketing for the queries the round-10 hog
  * harness flagged as storm-amplified (`dedup_clusters` 25x,
  * `dedup_containment` 15x, `dedup_lsh_pairs` 10.7x while their sibling
  * miners held 2-3x): each flagged query is decomposed at its internal
  * seams and every prefix/stage is measured as an independent memo-cold
  * run, idle then under the [[MemHog]] load — so the output names WHICH
  * action inside the query absorbs the reclaim storm instead of
  * re-measuring that the query as a whole does.
  *
  * Stages (every one starts memo-cold, blocks released):
  *   - jac_full        control: the sibling miner ngram-jaccard, full
  *   - cl_mine         nearDupPairs (mining + eager checkpoint) only
  *   - cl_probe        + the limit-collect edge probe over the pair graph
  *   - cl_uf           + driver union-find + LocalRelation count
  *   - cont_sets       containment's distinct window sets (persist+count)
  *   - cont_full       full containment (sets + pair join + checkpoint)
  *   - lsh_census      LSH bucket memberships (persist) + hot census collect
  *   - lsh_full        full lshNearDupPairs
  *
  * Usage: runMain graft.tools.StageBracket [repeats] [hogGb] [hogWorkers]
  *   (defaults 2, 40, 2 — the round-10 "moderate" load). */
object StageBracket {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = if (args.length > 0) args(0).toInt else 2
    val hogGb = if (args.length > 1) args(1).toInt else 40
    val hogWorkers = if (args.length > 2) args(2).toInt else 2
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
    val shmDir = new java.io.File("/dev/shm")
    if (shmDir.isDirectory && shmDir.canWrite) {
      val p = new java.io.File(shmDir, "graft-bench-local")
      p.mkdirs()
      builder.config("spark.local.dir", p.getAbsolutePath)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def docs = EventOps.tbl(spark, sfDir, "documents")

    def cold(): Unit = {
      TextOps.clearMinedPairs()
      spark.sharedState.cacheManager.clearCache()
      val persisted = spark.sparkContext.getPersistentRDDs.values
      if (persisted.nonEmpty) {
        persisted.foreach(_.unpersist(true)); System.gc()
      }
    }

    // Each experiment is a COLD prefix of one flagged query's dataflow;
    // differences between successive prefixes isolate one stage's cost.
    val experiments: Seq[(String, () => Unit)] = Seq(
      "jac_full" -> (() =>
        TextOps.dedupNgramJaccard(spark, sfDir).count(): Unit),
      "cl_mine" -> (() =>
        TextOps.nearDupPairs(spark, sfDir).count(): Unit),
      "cl_probe" -> (() => {
        val pairs = TextOps.nearDupPairs(spark, sfDir)
        val norm = pairs.select(col("doc_a").cast("long").as("doc_a"),
            col("doc_b").cast("long").as("doc_b"))
          .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
        norm.limit(TextOps.LocalCcEdgeLimit.toInt + 1).collect(): Unit
      }),
      "cl_uf" -> (() =>
        TextOps.dedupClusters(spark, sfDir).count(): Unit),
      "cont_sets" -> (() => {
        val lvl = Engine.miningLevel(docs)
        val sets = TextOps.dfCapWindows(TextOps.spanWindows(docs))
          .select(col("doc_id"), col("h")).distinct().persist(lvl)
        sets.count()
        sets.unpersist(true): Unit
      }),
      "cont_full" -> (() =>
        TextOps.dedupContainment(spark, sfDir).count(): Unit),
      "lsh_census" -> (() => {
        val lvl = Engine.miningLevel(docs)
        val buckets = TextOps.bandBuckets(
          TextOps.minhashSignatures(spark, sfDir)).persist(lvl)
        buckets.groupBy("bucket").agg(count(lit(1)).as("n_members"))
          .filter(col("n_members") > 4096).collect()
        buckets.unpersist(true): Unit
      }),
      "lsh_full" -> (() =>
        TextOps.lshNearDupPairs(spark, sfDir).count(): Unit))

    def phase(name: String): Map[String, Double] = {
      System.err.println(s"[bracket] phase=$name")
      experiments.map { case (ename, fn) =>
        val samples = (1 to repeats).map { _ =>
          cold()
          val t0 = System.nanoTime()
          fn()
          (System.nanoTime() - t0) / 1e9
        }
        System.err.println(s"[bracket] $name $ename " +
          samples.map(s => f"$s%.2f").mkString(", "))
        ename -> samples.min
      }.toMap
    }

    val idle = phase("idle")
    val hog = MemHog.start(hogGb, hogWorkers)
    val loaded =
      try phase("loaded")
      finally hog.stop()

    val rows = experiments.map { case (e, _) =>
      val r = loaded(e) / idle(e)
      f""""$e":{"idle":${idle(e)}%.3f,"loaded":${loaded(e)}%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val json = s"""{"tool":"stage_bracket","sf":"$sfDir","hog_gb":$hogGb,""" +
      s""""hog_workers":$hogWorkers,"repeats":$repeats,"stages":$rows}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_out/stage_bracket.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    println(json)
    try spark.stop() catch { case _: Throwable => () }
    System.exit(0)
  }
}
