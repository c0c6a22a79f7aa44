package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical session factory for the engine — the configuration the
  * pipeline's semantics and scale posture depend on.
  *
  * Semantics-critical (correctness changes without these):
  *  - mapKeyDedupPolicy=LAST_WIN: JS object-assignment semantics when
  *    case-folding collides data keys (P1);
  *  - session timeZone UTC: naive sensor timestamps are UTC-pinned.
  *
  * Scale posture (local defaults; a cluster deployment raises
  * shuffle.partitions to ~2-3x total cores and lets AQE coalesce):
  *  - AQE on: runtime re-planning, skew-join splitting;
  *  - extensions: graft's native functions available to SQL users.
  */
object Engine {

  def builder(master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // static conf consumed by ContextCleaner at context creation: lets
      // reliable-mode eagerCheckpoint dirs be deleted when their RDD is
      // GC'd (default false would leak one dir per checkpoint — see
      // eagerCheckpoint); harmless when reliable mode is off
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")

  def session(master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Deploy-mode switch for eager materialization of mined pair graphs
    * (dedup/cosine/simhash results, connected-components rounds): `false`
    * (default) = `localCheckpoint(eager)` — blocks live on executors, the
    * fastest cut for single-tenant batch and local mode, but an executor
    * loss kills the job because the truncated lineage cannot recompute;
    * `true` = reliable `checkpoint()` to the context's checkpoint dir
    * (HDFS/object store on a cluster) — survives executor loss at the
    * cost of one write+read of the materialized relation. Long-running
    * cluster jobs where executor churn is expected (spot instances,
    * >1000 executors at 100 TB) should set this plus
    * `sparkContext.setCheckpointDir`. */
  val ReliableCheckpointKey = "spark.graft.checkpoint.reliable"

  /** THE eager-materialization point for every pair-mining operator —
    * one policy, one place (round-7 VERDICT item 4). Semantics are
    * identical either way: lineage is truncated and the relation is
    * computed exactly once, here.
    *
    * Reliable mode additionally requires
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a STATIC
    * conf, set at session build — [[builder]] sets it): without it the
    * ContextCleaner never deletes checkpointed RDD directories, so a
    * long-running job would leak one directory per eagerCheckpoint call
    * to the checkpoint store. Required loudly here rather than silently
    * leaking. */
  def eagerCheckpoint(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    if (ss.conf.get(ReliableCheckpointKey, "false").toBoolean) {
      require(ss.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableCheckpointKey=true requires " +
          "sparkContext.setCheckpointDir(<fault-tolerant URI>)")
      // BOTH confs gate cleanup: referenceTracking=false means no
      // ContextCleaner exists at all, so cleanCheckpoints is never read
      require(ss.sparkContext.getConf.getBoolean(
            "spark.cleaner.referenceTracking", defaultValue = true) &&
          ss.sparkContext.getConf.getBoolean(
            "spark.cleaner.referenceTracking.cleanCheckpoints", false),
        s"$ReliableCheckpointKey=true requires " +
          "spark.cleaner.referenceTracking=true AND " +
          "spark.cleaner.referenceTracking.cleanCheckpoints=true at " +
          "session build (static confs) — otherwise every eager " +
          "checkpoint leaks a directory in the checkpoint store")
      df.checkpoint() // eager, reliable; cleaner deletes on RDD GC
    } else df.localCheckpoint(eager = true)
  }
}
