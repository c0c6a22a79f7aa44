package graft

import org.apache.spark.sql.SparkSession

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
      .config("spark.ui.enabled", "false")

  def session(master: String = "local[32]",
      shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
