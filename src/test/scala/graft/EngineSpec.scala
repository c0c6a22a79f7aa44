package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the ONE eager-materialization policy every pair-mining operator
  * routes through (`Engine.eagerCheckpoint`): local blocks by default,
  * reliable checkpoint under `spark.graft.checkpoint.reliable` — same
  * values either way, and the reliable path actually writes to the
  * context's checkpoint dir (executor-loss survivability is the point).
  */
class EngineSpec extends SparkSpec {

  private def withReliable[T](on: Boolean)(body: => T): T = {
    spark.conf.set(Engine.ReliableCheckpointKey, on.toString)
    try body finally spark.conf.unset(Engine.ReliableCheckpointKey)
  }

  test("default mode: localCheckpoint — lineage truncated, values intact") {
    val df = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    val out = Engine.eagerCheckpoint(df)
    assert(out.collect().map(_.getLong(1)).sum === 9900L)
    // truncated lineage: the optimized plan is a scan of materialized
    // blocks, not the original Range
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Range"), plan)
  }

  test("reliable mode: missing-dir guard, then identical values in the checkpoint dir") {
    // ONE ordered test, not two: SparkContext has no unsetCheckpointDir,
    // so once the happy path sets a dir the missing-dir guard can never
    // trip again in this shared-session JVM — phase 1 must run first.
    withReliable(true) {
      val e = intercept[IllegalArgumentException] {
        Engine.eagerCheckpoint(spark.range(10).toDF())
      }
      assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
    }
    // JVM-lifetime dir (round-7 ADVICE): the context's checkpoint dir
    // outlives this suite — deleting it here would leave the shared
    // SparkContext pointing at a dead path for every later suite, and
    // ContextCleaner's cleanCheckpoints deletions would log failures.
    // The shutdown hook in SparkSpec removes it at JVM exit instead.
    val dir = SparkSpec.checkpointRoot.resolve("reliable-ckpt").toFile
    dir.mkdirs()
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    val df = spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    val out = withReliable(true)(Engine.eagerCheckpoint(df))
    assert(out.collect().map(_.getLong(1)).sum === 9900L)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Range"), plan)
    // the materialization is ON DISK under the configured dir — this is
    // what survives an executor loss (local blocks would not)
    def files(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filterNot(_.isDirectory) ++ kids.filter(_.isDirectory).flatMap(files)
    }
    assert(files(dir).nonEmpty, s"no checkpoint files under $dir")
  }
}
