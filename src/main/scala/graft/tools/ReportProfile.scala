package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.TextOps

/** Per-miner attribution probe for the memo-cold `dedup_report` wall
  * (round-12 VERDICT item 5): the composed report runs its four mined
  * modalities concurrently off ONE shared artifact scan, so the cold
  * wall ≈ artifact materialization + max(miner) + the report's pair
  * full-outer joins. Whether that wall is reducible by sharing MORE
  * than the scan (a common banded index) depends on whether any two
  * miners' candidate joins key on the same space — this tool records
  * the numbers that answer it:
  *
  *   1. artifact materialization alone (all five per-doc artifact
  *      columns, cached);
  *   2. each miner individually from the WARM artifact cache — its
  *      irreducible own-geometry cost (banding, candidate join,
  *      verify);
  *   3. the composed concurrent report, memo-cold (what WarmProbe's
  *      `dedup_report_cold_s` measures);
  *   4. the serial sum, for the concurrency-overlap delta.
  *
  * If one miner ≈ the composed wall, the report is already at its
  * floor (the slowest geometry) and the remaining question is whether
  * THAT miner's join can be cheaper — not whether the miners can share
  * an index (they join on disjoint key spaces: ranked shingle prefixes,
  * simhash band keys, CDC chunk hashes, verbatim window hashes).
  *
  * Usage: runMain graft.tools.ReportProfile   (env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_OUT as in Bench). */
object ReportProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out/report_profile.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        graft.Engine.CodegenCacheMaxEntries.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val lvl = Engine.miningLevel(docs)

    def hygiene(): Unit = {
      TextOps.clearMinedPairs()
      spark.sharedState.cacheManager.clearCache()
      val persisted = spark.sparkContext.getPersistentRDDs.values
      if (persisted.nonEmpty) persisted.foreach(_.unpersist(true))
      System.gc()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    hygiene()
    // 1. the shared scan: all five artifact columns, materialized into
    // the cache exactly as reportImpl pays it
    val arts = TextOps.docArtifacts(docs).persist(lvl)
    val tArts = time(arts.count())

    // 2. each miner from the warm cache — the composed report's
    // per-modality marginal cost (memo writes cleared between samples so
    // no miner reads another's checkpointed residue)
    val tJac = time {
      TextOps.ngramJaccardFromShingles(
        arts.select(col("doc_id"), col("sh")),
        TextOps.DefaultNearDupThreshold, eager = true, lvl).count()
    }
    // partitioning A/B (r14): the same miner over the same warm cache
    // read through a narrow coalesce — discriminates how much of the
    // miner's wall is input-partition-count-sensitive (map-side combine
    // loss in the vocab-keyed freq agg vs kernel/explode parallelism)
    val tJacC4 = time {
      TextOps.ngramJaccardFromShingles(
        arts.select(col("doc_id"), col("sh")).coalesce(4),
        TextOps.DefaultNearDupThreshold, eager = true, lvl).count()
    }
    val tJacC1 = time {
      TextOps.ngramJaccardFromShingles(
        arts.select(col("doc_id"), col("sh")).coalesce(1),
        TextOps.DefaultNearDupThreshold, eager = true, lvl).count()
    }
    val tJac2 = time {
      TextOps.ngramJaccardFromShingles(
        arts.select(col("doc_id"), col("sh")),
        TextOps.DefaultNearDupThreshold, eager = true, lvl).count()
    }
    val tSh = time {
      TextOps.simhashPairsFromSigs(
        arts.select(col("doc_id"), col("sig")), 3, lvl).count()
    }
    val tCdc = time {
      TextOps.cdcChunksFromSets(
        arts.select(col("doc_id"), explode(col("cks")).as("ck")).distinct(),
        TextOps.DefaultNearDupThreshold, eager = true, lvl).count()
    }
    val tCt = time {
      TextOps.containmentFromWindows(
        arts.select(col("doc_id"), explode(col("whs")).as("h")), lvl).count()
    }
    arts.unpersist(true)

    // 3. the composed concurrent report, memo-cold
    hygiene()
    val tReport = time(TextOps.dedupReport(spark, sfDir).count())

    val serialSum = tArts + tJac + tSh + tCdc + tCt
    val json = f"""{"tool":"report_profile","sf":"$sfDir","cpus":$cpus,""" +
      f""""artifacts_s":$tArts%.3f,"jaccard_s":$tJac%.3f,""" +
      f""""jaccard_c4_s":$tJacC4%.3f,"jaccard_c1_s":$tJacC1%.3f,""" +
      f""""jaccard_rep2_s":$tJac2%.3f,""" +
      f""""simhash_s":$tSh%.3f,"cdc_s":$tCdc%.3f,""" +
      f""""containment_s":$tCt%.3f,"serial_sum_s":$serialSum%.3f,""" +
      f""""report_cold_s":$tReport%.3f}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
