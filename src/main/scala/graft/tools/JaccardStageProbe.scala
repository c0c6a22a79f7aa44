package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Engine
import graft.operators.TextOps

/** Stage-level attribution INSIDE the PPJoin jaccard miner — the
  * dominant term of the memo-cold `dedup_report` wall (ReportProfile:
  * the composed concurrent report ≈ the jaccard miner alone, so
  * round-12 VERDICT item 5's "share a banded index across miners" is
  * structurally dead and the only lever is this miner's own plan).
  * Times each stage cumulatively from the cached shingle relation:
  *   1. shingle materialization (cache fill);
  *   2. global term frequencies (one agg of the exploded relation);
  *   3. ranked prefixes via the row_number window (freq join-back +
  *      per-doc sort — the suspected heavy exchange);
  *   4. candidate generation (prefix self-join + positional/suffix
  *      group filter);
  *   5. the full miner (adds the exact verify join) — run LAST so the
  *      stage deltas are additive on a warm cache.
  *
  * Usage: runMain graft.tools.JaccardStageProbe (env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_OUT). */
object JaccardStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out/jaccard_stage_probe.json")
    val threshold = TextOps.DefaultNearDupThreshold
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docsRaw = spark.read.parquet(s"$sfDir/documents.parquet")
    val lvl = Engine.miningLevel(docsRaw)
    val docs = docsRaw
      .select(col("doc_id"), TextOps.shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0).persist(lvl)
    val tShingle = time(docs.count())

    val inv = docs.select(col("doc_id"),
      size(col("sh")).cast("long").as("n_sh"), explode(col("sh")).as("s"))
    val freq = inv.groupBy("s").agg(count(lit(1)).as("f"))
    var vocabN = 0L
    var idxRows = 0L
    val tFreq = time {
      val r = freq.agg(count(lit(1)), sum(col("f"))).first()
      vocabN = r.getLong(0)
      idxRows = if (r.isNullAt(1)) 0L else r.getLong(1)
    }

    val w = Window.partitionBy(col("doc_id")).orderBy(col("f"), col("s"))
    val prefixes = inv.join(freq, "s")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1)
      .select(col("doc_id"), col("n_sh"), col("rk"), col("s"))
      .persist(lvl)
    var prefixRows = 0L
    val tPrefix = time { prefixRows = prefixes.count() }

    val reqOverlap =
      ceil(lit(threshold / (1 + threshold)) * (col("a.n_sh") + col("b.n_sh")))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n_sh") * lit(threshold) <= col("a.n_sh") &&
          col("a.n_sh") * lit(threshold) <= col("b.n_sh") &&
          least(col("a.n_sh") - col("a.rk"), col("b.n_sh") - col("b.rk")) + 1
            >= reqOverlap)
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("cnt"),
        max(col("a.rk")).as("mra"), max(col("b.rk")).as("mrb"),
        max(col("a.n_sh")).as("na"), max(col("b.n_sh")).as("nb"))
      .filter(col("cnt") + least(col("na") - col("mra"), col("nb") - col("mrb"))
        >= ceil(lit(threshold / (1 + threshold)) * (col("na") + col("nb"))))
      .select(col("doc_a"), col("doc_b"))
    var candRows = 0L
    val tCand = time { candRows = cand.count() }

    prefixes.unpersist(true)
    // the shipped miner end-to-end from the warm shingle cache (its own
    // internal persists included), for the verify-join remainder
    var pairRows = 0L
    val tFull = time {
      pairRows = TextOps.ngramJaccardFromShingles(
        docs, threshold, eager = true, lvl).count()
    }
    docs.unpersist(true)

    val json = f"""{"tool":"jaccard_stage_probe","sf":"$sfDir",""" +
      f""""cpus":$cpus,"vocab":$vocabN,"idx_rows":$idxRows,""" +
      f""""prefix_rows":$prefixRows,"cand_rows":$candRows,""" +
      f""""pair_rows":$pairRows,""" +
      f""""shingle_s":$tShingle%.3f,"freq_s":$tFreq%.3f,""" +
      f""""prefix_window_s":$tPrefix%.3f,"cand_s":$tCand%.3f,""" +
      f""""full_miner_s":$tFull%.3f}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
