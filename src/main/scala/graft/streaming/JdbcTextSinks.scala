package graft.streaming

import graft.catalog.MetadataCatalog
import graft.operators.SqlText
import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** K1/K2 over JDBC with the reference's exact INSERT text
  * (app/mapper.js:306-358): statements are generated as column expressions
  * (SqlText) and executed on EXECUTORS — one connection per partition,
  * statements batched, transaction per partition — so throughput scales
  * with partition count and nothing funnels through the driver. The
  * reference's single rs_pool.query loop (mapper.js:258-292) is the
  * 1-partition degenerate case.
  *
  * K3/G1 (publisher + alert channels) are HTTP concerns in the reference
  * (SNS / Apiary POST, mapper.js:148-157/429-489), not JDBC — injected as
  * serializable callbacks (executed on executors) with no-op defaults.
  *
  * Delivery is at-least-once per micro-batch (see ParquetSinks note);
  * batchId is surfaced so a production deployment can make the partition
  * transaction idempotent (e.g. a (batch_id, partition_id) ledger table).
  */
class JdbcTextSinks(
    url: String,
    connProps: Map[String, String] = Map.empty,
    batchSize: Int = 1000,
    onEvent: String => Unit = _ => (),
    onAlert: Alerts.AlertEvent => Unit = _ => ())
  extends StreamPipeline.Sinks {

  private def executeSql(withSql: DataFrame): Unit = {
    val (u, props, bs) = (url, connProps, batchSize)
    withSql.select("sql").foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(u, p)
        try {
          conn.setAutoCommit(false)
          val st = conn.createStatement()
          var n = 0
          it.foreach { r =>
            // the golden text carries the reference's ';' terminator;
            // JDBC statements take it without one
            st.addBatch(r.getString(0).stripSuffix(";"))
            n += 1
            if (n % bs == 0) st.executeBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  def writeWide(featureObs: DataFrame, catalog: MetadataCatalog,
      batchId: Long): Unit =
    executeSql(SqlText.featureInsertText(featureObs, catalog))

  def writeDeadLetter(df: DataFrame, batchId: Long): Unit =
    executeSql(SqlText.misfitInsertText(df))

  def writeEvents(df: DataFrame, batchId: Long): Unit = {
    val f = onEvent
    df.select("event_json").foreachPartition { (it: Iterator[Row]) =>
      it.foreach(r => f(r.getString(0)))
    }
  }

  def writeAlerts(df: Dataset[Alerts.AlertEvent], batchId: Long): Unit = {
    val f = onAlert
    df.foreachPartition((it: Iterator[Alerts.AlertEvent]) => it.foreach(f))
  }
}
