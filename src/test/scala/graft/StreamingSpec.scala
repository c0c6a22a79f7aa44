package graft

import graft.catalog.MetadataCatalog
import graft.operators.Pipeline
import graft.streaming.{Alerts, StreamPipeline}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.collection.mutable

/** End-to-end streaming suite: the 8 canonical observations fed as JSON
  * through a MemoryStream, asserting the reference integration truths
  * (integration_tests.js:334-425) — 7 publisher events, 4 dead-letter rows,
  * per-table wide rows — plus blacklist alert/resolve transitions.
  */
class StreamingSpec extends SparkSpec {

  class CollectingSinks extends StreamPipeline.Sinks {
    val wide = mutable.Map[(String, String), mutable.Buffer[Map[String, Any]]]()
    val deadLetters = mutable.Buffer[(String, String, String)]() // network, node, json
    val events = mutable.Buffer[String]()
    val alerts = mutable.Buffer[Alerts.AlertEvent]()
    def writeWide(featureObs: DataFrame, catalog: MetadataCatalog,
        batchId: Long): Unit = synchronized {
      // regroup the single aggregated relation into per-(network, feature)
      // typed wide rows — same shape the per-feature loop used to deliver
      featureObs.select("network", "feature").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
        .foreach { case (network, feature) =>
          val buf = wide.getOrElseUpdate((network, feature), mutable.Buffer())
          Pipeline.widenFromResults(
              featureObs.filter(col("network") <=> network), catalog, feature)
            .collect().foreach { r =>
              buf += r.schema.fieldNames.zip(r.toSeq).toMap
            }
        }
    }
    def writeDeadLetter(df: DataFrame, batchId: Long): Unit = synchronized {
      df.select("network", "node_id", "data").collect().foreach(r =>
        deadLetters += ((r.getString(0), r.getString(1), r.getString(2))))
    }
    def writeEvents(df: DataFrame, batchId: Long): Unit = synchronized {
      events ++= df.select("event_json").collect().map(_.getString(0))
    }
    def writeAlerts(df: Dataset[Alerts.AlertEvent], batchId: Long): Unit =
      synchronized { alerts ++= df.collect() }
  }

  def obsJson(i: Int): String = {
    // the 8 fixtures rendered as raw JSON documents (original casing/types)
    val o = Fixtures.observations(i)
    val data = o.data.map { case (k, v) =>
      val vs = v.jstype match {
        case "string" => "\"" + v.lex + "\""
        case _ => v.lex
      }
      "\"" + k + "\":" + vs
    }.mkString(",")
    s"""{"network":"${o.network}","node_id":"${o.node_id}","meta_id":${o.meta_id},""" +
      s""""datetime":"2017-01-01T00:00:00","sensor":"${o.sensor}","data":{$data}}"""
  }

  test("streaming end-to-end: 8 observations in order, one batch each") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val sinks = new CollectingSinks
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    // one micro-batch per observation, in order (the reference's sequential
    // trace) — start queries once per batch with AvailableNow
    (0 until 8).foreach { i =>
      source.addData(obsJson(i))
      val queries = StreamPipeline.start(
        source.toDF().withColumnRenamed("value", "value"),
        () => Fixtures.catalog, sinks, ckpt)
      queries.foreach(_.awaitTermination(60000))
    }

    // K3: 7 publisher events
    assert(sinks.events.size === 7)
    assert(sinks.events.count(_.contains("\"node\":\"001\"")) === 2)
    assert(sinks.events.exists(e =>
      e.contains("\"node\":\"003\"") && e.contains("\"results\":{\"z\":90.92}")))

    // K2: 4 dead-letter rows with exact JSON
    assert(sinks.deadLetters.size === 4)
    val dlByNode = sinks.deadLetters.map(d => d._2 -> d._3).toMap
    assert(dlByNode("003") === """{"x1":56.77,"y1":32.11}""")
    assert(dlByNode("005") === """{"temp":"high","humdrum":27.48}""")

    // K1: wide tables routed per (network, feature)
    assert(sinks.wide(("array_of_things_chicago", "magnetic_field")).size === 2)
    assert(sinks.wide(("array_of_things_chicago", "computer_vision")).size === 2)
    assert(sinks.wide(("internet_of_stuff_seattle", "temperature")).size === 1)
    val n2 = sinks.wide(("array_of_things_chicago", "magnetic_field"))
      .find(_("node_id") == "002").get
    assert(n2("x") == null && n2("y") == 32.11 && n2("z") == 90.92)

    // G1: alerts for hmc5883l (unknown keys), camera (coercion), htu21d
    // (both), wubdb89 (does_not_exist); resolves for camera + htu21d when
    // clean observations follow (obs7, obs8)
    val alertsByKind = sinks.alerts.groupBy(_.kind)
    val alertSensors = alertsByKind("alert").map(_.sensor).toSet
    assert(alertSensors === Set("hmc5883l", "camera", "htu21d", "wubdb89"))
    val resolveSensors = alertsByKind("resolve").map(_.sensor).toSet
    assert(resolveSensors === Set("camera", "htu21d"))
    // 5 error messages total across the 4 alerts (htu21d carries 2)
    assert(alertsByKind("alert").map(_.messages.size).sum === 5)
    val htu = alertsByKind("alert").find(_.sensor == "htu21d").get
    assert(htu.messages.exists(_.contains("unknown key(s) humdrum")))
    assert(htu.messages.exists(_.contains("could not correctly coerce value high")))
    val wub = alertsByKind("alert").find(_.sensor == "wubdb89").get
    assert(wub.messages.head.contains("not found in sensor metadata"))
  }

  test("connector contract: Kafka-shaped stream drives the full pipeline") {
    // The exact relation a real `readStream.format("kafka").load()` yields:
    // binary key/value plus transport bookkeeping columns. No connector
    // jars in this sandbox, so the SHAPE is pinned with an in-memory
    // stream — the production swap is the load() call only
    // (reference transport parity: app/consumer/kcl_app.js:36-50).
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    def rec(key: String, value: String, off: Long) =
      (key.getBytes("UTF-8"), value.getBytes("UTF-8"),
        "plenario-observations", (off % 3).toInt, off)

    // batch leg: fromConnector is the contract — UTF-8 value decode,
    // transport columns dropped, malformed payloads silently filtered (S2)
    val batch = (Seq(rec("k0", obsJson(0), 0L), rec("k1", obsJson(1), 1L),
        rec("k2", "{not json", 2L)) :+
        (Array[Byte](-1, -2), Array[Byte](-1, 0, -56), "t", 0, 3L))
      .toDF("key", "value", "topic", "partition", "offset")
    val parsed = graft.sources.ObservationSource.fromConnector(batch).collect()
    assert(parsed.length === 2, "2 well-formed of 4; transport columns ignored")
    assert(parsed.map(_.node_id).toSet === Set("001", "002"))

    // streaming leg: the same cast wiring feeds StreamPipeline.start; all
    // 8 fixtures + 1 malformed record in ONE AvailableNow drain — the
    // stateless sink truths (events, dead letters, wide rows) must match
    // the per-batch drive above exactly; the malformed record vanishes
    val source = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long)]
    (0 until 8).foreach(i => source.addData(rec(s"k$i", obsJson(i), i.toLong)))
    source.addData((null, "…garbage…".getBytes("UTF-8"), "t", 0, 8L))
    val kafkaShaped = source.toDF()
      .toDF("key", "value", "topic", "partition", "offset")
    val sinks = new CollectingSinks
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt").toString
    val queries = StreamPipeline.start(
      kafkaShaped.selectExpr("CAST(value AS STRING) AS value"),
      () => Fixtures.catalog, sinks, ckpt)
    queries.foreach(_.awaitTermination(60000))

    assert(sinks.events.size === 7)
    assert(sinks.deadLetters.size === 4)
    assert(sinks.wide(("array_of_things_chicago", "magnetic_field")).size === 2)
    assert(sinks.wide(("array_of_things_chicago", "computer_vision")).size === 2)
    assert(sinks.wide(("internet_of_stuff_seattle", "temperature")).size === 1)
  }

  test("catalog fix mid-stream emits resolve in the next batch — no restart") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val sinks = new CollectingSinks
    val ckpt = Files.createTempDirectory("graft-ckpt-midstream").toString
    val ghostObs =
      """{"network":"net","node_id":"n1","meta_id":1,""" +
        """"datetime":"2017-01-01T00:00:00","sensor":"ghost","data":{"a":1}}"""
    // catalog V1: sensor unknown -> does_not_exist alert
    @volatile var catalog = MetadataCatalog.fromMaps(
      Map.empty[String, Map[String, String]],
      Map.empty[String, Seq[(String, String)]])
    val queries = StreamPipeline.start(
      source.toDF(), () => catalog, sinks, ckpt, availableNow = false)
    // the alert query runs with the blacklist TTL armed
    // (ProcessingTimeTimeout), under which processAllAvailable can never
    // latch no-new-data — the engine keeps constructing batches so
    // expirations can fire — so this test polls the sink instead
    def awaitAlerts(n: Int): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (sinks.alerts.size < n && System.currentTimeMillis < deadline)
        Thread.sleep(100)
    }
    try {
      source.addData(ghostObs)
      queries(0).processAllAvailable()
      awaitAlerts(1)
      assert(sinks.alerts.map(_.kind) === Seq("alert"))
      assert(sinks.alerts.head.sensor === "ghost")
      // register the sensor MID-STREAM — queries keep running
      catalog = MetadataCatalog.fromMaps(
        Map("ghost" -> Map("a" -> "f.a")),
        Map("f" -> Seq("a" -> "integer")))
      source.addData(ghostObs)
      queries(0).processAllAvailable()
      awaitAlerts(2)
      // the fix is visible in the very next batch: resolve, no restart
      assert(sinks.alerts.map(_.kind) === Seq("alert", "resolve"))
    } finally queries.foreach(_.stop())
  }

  test("alert message key order follows document order for >4 data keys") {
    val spark2 = spark
    import spark2.implicits._
    // >4 entries is where a Map-typed field deserializes into a
    // HashMap and scrambles order — the status path must carry pairs as
    // an ordered array instead (DataPair seq via map_entries)
    val json =
      """{"network":"net","node_id":"n1","meta_id":1,""" +
        """"datetime":"2017-01-01T00:00:00","sensor":"tmp112","data":""" +
        """{"zk1":1,"yk2":2,"xk3":3,"wk4":4,"vk5":5,"uk6":6,"temperature":7}}"""
    val catalog = MetadataCatalog.fromMaps(
      Map("tmp112" -> Map("temperature" -> "temperature.temp")),
      Map("temperature" -> Seq("temp" -> "float")))
    val obs = graft.sources.ObservationSource.parse(
      Seq(json).toDF("value")).toDF()
    val statuses = graft.streaming.Alerts.observationStatuses(obs, catalog)
      .collect()
    assert(statuses.length === 1)
    val msg = statuses.head.messages.head
    assert(msg.contains("unknown key(s) zk1,yk2,xk3,wk4,vk5,uk6"),
      s"keys out of document order: $msg")
  }

  test("blacklist transition: alert suppressed while blacklisted, re-alerts after resolve") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // pure transition-function check across simulated batches
    val st = new TestGroupState(None)
    def step(statuses: Alerts.ObsStatus*): Seq[Alerts.AlertEvent] =
      Alerts.transition("s1", statuses.iterator, st).toSeq
    val err = Alerts.ObsStatus("s1", "net", "invalid_key", Seq("m1"))
    val ok = Alerts.ObsStatus("s1", "net", null, Nil)
    assert(step(err).map(_.kind) === Seq("alert"))
    assert(step(err) === Nil)                       // suppressed
    assert(step(ok).map(_.kind) === Seq("resolve")) // clears
    assert(step(ok) === Nil)                        // no spurious resolve
    assert(step(err).map(_.kind) === Seq("alert"))  // re-alerts
  }

  test("blacklist TTL: expired state is dropped and the sensor re-alerts on return") {
    val st = new TestGroupState(None)
    def step(statuses: Alerts.ObsStatus*): Seq[Alerts.AlertEvent] =
      Alerts.transition("s1", statuses.iterator, st).toSeq
    val err = Alerts.ObsStatus("s1", "net", "invalid_key", Seq("m1"))
    assert(step(err).map(_.kind) === Seq("alert"))
    assert(st.armedTimeoutMs === Some(Alerts.blacklistTtlMs)) // TTL armed
    assert(step(err) === Nil)                                 // suppressed
    // simulate the ProcessingTimeTimeout firing: empty batch, hasTimedOut
    st.timedOut = true
    assert(Alerts.transition("s1", Iterator.empty, st).toSeq === Nil)
    assert(st.value === None)                                 // state dropped
    st.timedOut = false
    assert(step(err).map(_.kind) === Seq("alert"))            // re-alerts
  }

  test("transformWithState blacklist twin: alert/suppress/resolve/re-alert through a live stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // state API v2 requires the RocksDB provider; scope it to this query.
    // Changelog checkpointing is the at-scale configuration (per-batch
    // commits append a changelog instead of zip-snapshotting every store),
    // and 2 state partitions keep a 5-batch unit test from paying 32
    // RocksDB commits per batch.
    val overrides = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true",
      "spark.sql.shuffle.partitions" -> "2")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val source = MemoryStream[Alerts.ObsStatus]
      val out = mutable.Buffer[Alerts.AlertEvent]()
      // ttlMs = 0 ⇒ TimeMode.None: batches fire only on data, so
      // processAllAvailable drains (ProcessingTime mode spins empty
      // batches for TTL eviction and never settles — see the scaladoc)
      val q = Alerts.alertStreamTws(source.toDS(), ttlMs = 0L)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-tws").toString)
        .foreachBatch((df: Dataset[Alerts.AlertEvent], _: Long) =>
          out.synchronized { out ++= df.collect() }: Unit)
        .start()
      val err = Alerts.ObsStatus("s1", "net", "invalid_key", Seq("m1"))
      val ok = Alerts.ObsStatus("s1", "net", null, Nil)
      def feed(s: Alerts.ObsStatus): Unit = {
        source.addData(s); q.processAllAvailable()
      }
      feed(err) // alert
      feed(err) // suppressed while blacklisted
      feed(ok)  // resolve
      feed(ok)  // no spurious resolve
      feed(err) // re-alerts after resolve
      q.stop()
      assert(out.map(_.kind).toSeq === Seq("alert", "resolve", "alert"))
      assert(out.head.messages === Seq("m1"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** Shared harness for the TWS-TTL cases: RocksDB + changelog
    * checkpointing (the at-scale configuration), a sink-polling waiter
    * (ProcessingTime TimeMode keeps scheduling batches, so
    * processAllAvailable is not a settling point), and conf restoration. */
  private def withTwsTtlHarness(ttlMs: Long)(
      body: (MemoryStream[Alerts.ObsStatus] => org.apache.spark.sql.streaming.StreamingQuery,
             mutable.Buffer[Alerts.AlertEvent], Int => Unit) => Unit): Unit = {
    val spark2 = spark
    import spark2.implicits._
    val overrides = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true",
      "spark.sql.shuffle.partitions" -> "2")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val cp = Files.createTempDirectory("graft-tws-ttl").toString
      val out = mutable.Buffer[Alerts.AlertEvent]()
      def start(src: MemoryStream[Alerts.ObsStatus]) =
        Alerts.alertStreamTws(src.toDS(), ttlMs = ttlMs)
          .writeStream.outputMode("append")
          .option("checkpointLocation", cp)
          .foreachBatch((df: Dataset[Alerts.AlertEvent], _: Long) =>
            out.synchronized { out ++= df.collect() }: Unit)
          .start()
      def awaitAlerts(n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (out.synchronized(out.length) < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(out.synchronized(out.length) === n,
          s"waiting for $n alerts, have: ${out.synchronized(out.toList)}")
      }
      body(start, out, awaitAlerts)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  private def errStatus(s: String) =
    Alerts.ObsStatus(s, "net", "invalid_key", Seq("m"))

  /** Barrier before stop(): the sink callback fires BEFORE the batch's
    * commit-log entry is written, so a stop() racing the commit makes the
    * restarted query replay the batch (at-least-once). Wait until progress
    * reports the batch complete, plus a margin for the commit write. */
  private def awaitCommitted(q: org.apache.spark.sql.streaming.StreamingQuery,
      batchId: Long): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (Option(q.lastProgress).map(_.batchId).getOrElse(-1L) < batchId &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(Option(q.lastProgress).map(_.batchId).getOrElse(-1L) >= batchId,
      s"batch $batchId never reported complete")
    Thread.sleep(500)
  }

  test("tws blacklist survives a restart via the RocksDB changelog: recovered state suppresses inside the TTL window") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // TTL far above any restart latency, so the only way s1 stays silent
    // post-restart is the changelog-recovered blacklist row
    withTwsTtlHarness(ttlMs = 120000L) { (start, out, awaitAlerts) =>
      val src1 = MemoryStream[Alerts.ObsStatus]
      val q1 = start(src1)
      src1.addData(errStatus("s1"))
      awaitAlerts(1)
      awaitCommitted(q1, 0L)
      q1.stop()
      val src2 = MemoryStream[Alerts.ObsStatus]
      src2.addData(errStatus("s1")) // replay committed batch-0 offsets
      val q2 = start(src2)
      // s2 is the ordering sentinel: its alert proves the batch carrying
      // the suppressed s1 committed (and that batch 0 was not re-run)
      src2.addData(errStatus("s1"), errStatus("s2"))
      awaitAlerts(2)
      q2.stop()
      assert(out.map(e => (e.sensor, e.kind)).toSeq ===
        Seq(("s1", "alert"), ("s2", "alert")), out)
    }
  }

  test("tws blacklist TTL eviction re-alerts — within a run and across a restart boundary") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ttlMs = 5000L
    withTwsTtlHarness(ttlMs) { (start, out, awaitAlerts) =>
      val src1 = MemoryStream[Alerts.ObsStatus]
      val q1 = start(src1)
      src1.addData(errStatus("s1"))
      awaitAlerts(1) // alert; TTL armed
      // sentinel batch well inside the TTL: s1 suppressed, s2 commits it
      src1.addData(errStatus("s1"), errStatus("s2"))
      awaitAlerts(2)
      // cross the TTL boundary in-run: the store evicts the expired row
      // (expired-reads-as-absent), so s1 must re-alert
      Thread.sleep(ttlMs + 2000)
      src1.addData(errStatus("s1"))
      awaitAlerts(3)
      awaitCommitted(q1, 2L)
      q1.stop()
      // let the re-armed row expire while the query is DOWN, restart from
      // the changelog checkpoint: the recovered-then-expired row must also
      // read as absent → re-alert (extra restart latency only widens the
      // already-crossed boundary, so this direction cannot race)
      Thread.sleep(ttlMs + 2000)
      val src2 = MemoryStream[Alerts.ObsStatus]
      src2.addData(errStatus("s1"))
      src2.addData(errStatus("s1"), errStatus("s2"))
      src2.addData(errStatus("s1"))
      val q2 = start(src2)
      src2.addData(errStatus("s1"))
      awaitAlerts(4)
      q2.stop()
      assert(out.map(_.sensor).toSeq === Seq("s1", "s2", "s1", "s1"), out)
      assert(out.map(_.kind).distinct === Seq("alert"), out)
    }
  }

  /** Minimal GroupState stub for unit-testing the transition function. */
  class TestGroupState(var value: Option[Alerts.SensorState],
      var timedOut: Boolean = false)
      extends org.apache.spark.sql.streaming.GroupState[Alerts.SensorState] {
    var armedTimeoutMs: Option[Long] = None
    def exists: Boolean = value.isDefined
    def get: Alerts.SensorState = value.get
    def getOption: Option[Alerts.SensorState] = value
    def update(s: Alerts.SensorState): Unit = value = Some(s)
    def remove(): Unit = value = None
    def hasTimedOut: Boolean = timedOut
    def setTimeoutDuration(d: Long): Unit = armedTimeoutMs = Some(d)
    def setTimeoutDuration(d: String): Unit = ()
    def setTimeoutTimestamp(t: Long): Unit = ()
    def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
    def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
    def getCurrentWatermarkMs(): Long = 0L
    def getCurrentProcessingTimeMs(): Long = 0L
  }
}
