package graft.streaming

import graft.catalog.MetadataCatalog
import graft.model.Observation
import graft.operators.Pipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** S1/X1/G2 — the streaming shell around the batch pipeline.
  *
  * The reference's KCL daemon protocol, shard FSM, and checkpoint
  * round-trip (617 LoC, SURVEY.md §3.3) are subsumed by Structured
  * Streaming: micro-batch scheduling, offset WAL (`checkpointLocation`),
  * and restart semantics need zero engine code. Catalog refresh-on-miss
  * (G2) degenerates to re-reading the catalog every micro-batch inside
  * foreachBatch — an observation is never judged against stale metadata.
  *
  * Sinks are injected (side effects stay at the edge): production would
  * bind JDBC/HTTP/socket writers; tests bind collectors.
  */
object StreamPipeline {

  /** Sink interface — one call per micro-batch per output. */
  trait Sinks extends Serializable {
    /** K1: valid observations, wide, one table per (network, feature). */
    def writeWide(network: String, feature: String, df: DataFrame, batchId: Long): Unit
    /** K2: dead-letter rows (obs identity + misfit-pair JSON). */
    def writeDeadLetter(df: DataFrame, batchId: Long): Unit
    /** K3: publisher events (feature observations + rendered JSON). */
    def writeEvents(df: DataFrame, batchId: Long): Unit
    /** G1: alert-channel events. */
    def writeAlerts(df: Dataset[Alerts.AlertEvent], batchId: Long): Unit
  }

  /** Parquet sinks: per-(network, feature) directories named
    * `<network>__<feature>` exactly like the reference's Redshift tables,
    * partitioned write, sort-within-partitions on datetime matching the
    * reference DDL's SORTKEY (tests/configure_tests.js:85-86).
    *
    * Delivery: at-least-once — foreachBatch can replay a batch after a
    * crash between append and checkpoint commit, duplicating its rows
    * (same as the reference's checkpoint-after-async-inserts,
    * kcl_app.js:56-59). `batchId` is passed so a production sink can
    * upgrade to effectively-once with a transactional/idempotent write
    * (e.g. batchId-keyed overwrite or a Delta-style commit). */
  class ParquetSinks(baseDir: String) extends Sinks {
    def writeWide(network: String, feature: String, df: DataFrame, batchId: Long): Unit =
      df.sortWithinPartitions("datetime").write.mode("append")
        .parquet(s"$baseDir/${network}__$feature")
    def writeDeadLetter(df: DataFrame, batchId: Long): Unit = {
      // materialize once — the misfits aggregation would otherwise re-run
      // per distinct network (N+1 jobs)
      val cached = df.cache()
      try {
        cached.select("network").distinct().collect().map(_.getString(0))
          .foreach { network =>
            // null-safe comparison: observations without a network field
            // still land in a dead-letter table instead of vanishing
            cached.filter(col("network") <=> network)
              .write.mode("append").parquet(s"$baseDir/${network}__unknown_feature")
          }
      } finally cached.unpersist()
    }
    def writeEvents(df: DataFrame, batchId: Long): Unit =
      df.write.mode("append").parquet(s"$baseDir/_events")
    def writeAlerts(df: Dataset[Alerts.AlertEvent], batchId: Long): Unit =
      df.write.mode("append").parquet(s"$baseDir/_alerts")
  }

  /** One micro-batch of the full dataflow (also the batch entry point). */
  def processBatch(observations: DataFrame, catalog: MetadataCatalog,
      sinks: Sinks, batchId: Long): Unit = {
    val classified = Pipeline.pairRelation(observations, catalog).cache()
    try {
      Pipeline.presentFeatures(classified).foreach { case (network, feature) =>
        sinks.writeWide(network, feature,
          Pipeline.widen(classified.filter(col("network") <=> network),
            catalog, feature), batchId)
      }
      sinks.writeDeadLetter(Pipeline.misfits(classified), batchId)
      sinks.writeEvents(
        Pipeline.eventJson(Pipeline.featureObservations(classified), catalog),
        batchId)
    } finally classified.unpersist()
  }

  /** Start the streaming pipeline over a raw JSON-lines stream.
    *
    * Two queries share the source: the dataflow query (foreachBatch →
    * sinks, with per-batch catalog refresh = G2) and the alert query
    * (flatMapGroupsWithState blacklist = G1). Both checkpoint under
    * `checkpointDir` (X1).
    */
  def start(
      raw: DataFrame, // streaming DF with a string `value` column
      catalogProvider: () => MetadataCatalog,
      sinks: Sinks,
      checkpointDir: String): Seq[StreamingQuery] = {
    val spark = raw.sparkSession
    val observations = graft.sources.ObservationSource.parse(raw).toDF()

    val dataQuery = observations.writeStream
      .queryName("graft-dataflow")
      .option("checkpointLocation", s"$checkpointDir/dataflow")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val catalog = catalogProvider() // per-batch re-read (G2)
        processBatch(batch.toDF(), catalog, sinks, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()

    val alertQuery = {
      val typed = graft.sources.ObservationSource.parse(raw)
      // NOTE: the alert path resolves the catalog at query (re)start, not
      // per micro-batch — the status closure ships a fixed sensor index to
      // executors. The DATAFLOW path (above) re-reads per batch, so routing
      // is never stale; a catalog change can at most delay alert/resolve
      // transitions until the next (re)start. With Trigger.AvailableNow in
      // a restart loop (the test/ops pattern here) both paths refresh.
      val statuses = Alerts.observationStatuses(typed, catalogProvider())
      Alerts.alertStream(statuses).writeStream
        .queryName("graft-alerts")
        .option("checkpointLocation", s"$checkpointDir/alerts")
        .foreachBatch { (batch: Dataset[Alerts.AlertEvent], batchId: Long) =>
          sinks.writeAlerts(batch, batchId)
        }
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }

    Seq(dataQuery, alertQuery)
  }
}
