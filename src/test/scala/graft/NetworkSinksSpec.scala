package graft

import graft.operators.Pipeline
import graft.streaming.{Alerts, NetworkSinks}
import org.apache.spark.sql.functions._

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/** Live side-effect channels against real in-process servers: the
  * publisher socket receives the exact `["internal_data",<event>]` frames
  * and the alert endpoint the exact `{"name":…,"value":…}` POST bodies
  * (app/mapper.js:291-296 / 456-466). */
class NetworkSinksSpec extends SparkSpec {

  /** Line-collecting TCP server; accepts any number of connections.
    * `expectLines` bounds the post-body drain: readers are polled until
    * that many lines arrive (or a deadline) instead of a fixed sleep —
    * a fixed sleep under-collects on a loaded box. */
  private def withSocketServer[A](expectLines: Int)(body: Int => A)
      : (A, Seq[String]) = {
    val lines = new ConcurrentLinkedQueue[String]()
    val server = new ServerSocket(0)
    @volatile var running = true
    val acceptor = new Thread(() => {
      try while (running) {
        val s = server.accept()
        new Thread(() => {
          val in = new BufferedReader(
            new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
          var l = in.readLine()
          while (l != null) { lines.add(l); l = in.readLine() }
          s.close()
        }).start()
      } catch { case _: java.net.SocketException => () }
    })
    acceptor.start()
    try {
      val r = body(server.getLocalPort)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (lines.size < expectLines && System.nanoTime() < deadline)
        Thread.sleep(20)
      (r, scala.jdk.CollectionConverters.IteratorHasAsScala(
        lines.iterator()).asScala.toSeq)
    } finally { running = false; server.close() }
  }

  /** Body-collecting HTTP server answering 200 to every POST. */
  private def withHttpServer[A](body: String => A): (A, Seq[String]) = {
    val bodies = new ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress(0), 0)
    server.createContext("/apiary/send_message", exchange => {
      val b = new String(exchange.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      bodies.add(b)
      exchange.sendResponseHeaders(200, 2)
      exchange.getResponseBody.write("ok".getBytes)
      exchange.getResponseBody.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/apiary/send_message"
      val r = body(url)
      (r, scala.jdk.CollectionConverters.IteratorHasAsScala(
        bodies.iterator()).asScala.toSeq)
    } finally server.stop(0)
  }

  test("publisher socket receives one internal_data frame per event") {
    val spark2 = spark
    import spark2.implicits._
    val classified = Pipeline.pairRelation(
      Fixtures.observations.toDF(), Fixtures.catalog)
    val events = Pipeline.eventJson(
      Pipeline.featureObservations(classified), Fixtures.catalog)
    val expected = events.select("event_json").collect()
      .map(r => s"""["internal_data",${r.getString(0)}]""").toSet

    val (_, lines) = withSocketServer(expected.size) { port =>
      NetworkSinks.emitEvents(events, "127.0.0.1", port)
    }
    assert(lines.toSet === expected)
    // every frame is a well-formed JSON array ["internal_data", {...}]
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.foreach { l =>
      val n = om.readTree(l)
      assert(n.isArray && n.get(0).asText() === "internal_data" &&
        n.get(1).isObject, l)
    }
  }

  test("alert endpoint receives the reference's POST body per alert") {
    val spark2 = spark
    import spark2.implicits._
    val alerts = Seq(
      Alerts.AlertEvent("does_not_exist", "alert",
        Seq("Sensor does_not_exist of network array_of_things_chicago does not exist")),
      Alerts.AlertEvent("htu21d", "resolve", Nil)).toDS()

    val (_, bodies) = withHttpServer { url =>
      NetworkSinks.postAlerts(alerts.filter(_.kind == "alert"), url)
    }
    assert(bodies === Seq("""{"name":"does_not_exist","value":"Sensor """ +
      """does_not_exist of network array_of_things_chicago does not exist"}"""))
  }

  test("a failing endpoint fails the job (no silent alert loss)") {
    val spark2 = spark
    import spark2.implicits._
    val alerts = Seq(Alerts.AlertEvent("s1", "alert", Seq("m"))).toDS()
    val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress(0), 0)
    server.createContext("/apiary/send_message", exchange => {
      exchange.sendResponseHeaders(500, -1)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/apiary/send_message"
      val ex = intercept[org.apache.spark.SparkException] {
        NetworkSinks.postAlerts(alerts, url)
      }
      assert(ex.getMessage != null)
    } finally server.stop(0)
  }
}
