package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-choice attribution for `text_cosine_pairs` (round-12 VERDICT
  * item 2): the operator picks kernel / prefix / salted / plain from
  * measured index stats, and the bench rows alone don't say WHICH path a
  * given scale executed — so the sf1 tail was unattributable. This probe
  * runs the shipped query once per scale dir and records the decision
  * register ([[graft.operators.TextOps.lastCosinePlan]] — written at the
  * exact admission site, so the artifact cannot drift from the code) plus
  * the wall time, one JSON line per scale.
  *
  * Usage: runMain graft.tools.CosinePlanProbe <sfDir> [<sfDir> ...]
  * (env SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_OUT as in Bench; output file
  * cosine_plan.json under the bench-out dir). */
object CosinePlanProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_out/cosine_plan.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warmup
    def hygiene(): Unit = {
      graft.operators.TextOps.clearMinedPairs()
      spark.sharedState.cacheManager.clearCache()
      val persisted = spark.sparkContext.getPersistentRDDs.values
      if (persisted.nonEmpty) persisted.foreach(_.unpersist(true))
    }
    val lines = dirs.map { d =>
      hygiene()
      val t0 = System.nanoTime()
      val rows = graft.operators.TextOps.textCosinePairs(spark, d).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val plan = graft.operators.TextOps.lastCosinePlan
        .getOrElse("""{"path":"UNSET"}""")
      val line = f"""{"tool":"cosine_plan","sf":"$d","cpus":$cpus,""" +
        f""""wall_s":$wall%.3f,"rows":$rows,"plan":$plan}"""
      println(line)
      line
    }
    val f = new java.io.File(outPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    spark.stop()
  }
}
