package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (JVM-wide singleton). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  /** Per-JVM root for anything the shared SparkContext must be able to
    * reach for the REST of the run (e.g. its checkpoint dir, which has no
    * unset and which ContextCleaner deletes from on RDD GC) — suites must
    * not delete it mid-session; the hook removes it at JVM exit. */
  lazy val checkpointRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-test-ckpt-root")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit))
    p
  }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
      // static conf (ContextCleaner reads it at context creation): required
      // by Engine.eagerCheckpoint's reliable mode (EngineSpec) so
      // checkpoint dirs are deleted on RDD GC instead of leaking
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
