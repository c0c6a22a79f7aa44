package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.JsValues
import graft.model.{ObservationRow, TaggedScalar}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** S1/S2 — stream scan + malformed-record filter.
  *
  * The reference pulls base64 JSON records off Kinesis via the KCL daemon and
  * drops records that fail JSON.parse, logging and continuing
  * (app/consumer/kcl_app.js:36-50). Here the transport is any Spark source
  * that yields a string `value` column (file source, socket, Kafka/Kinesis
  * connector in prod, MemoryStream in tests); parsing tags every data scalar
  * with its JSON type so coercion (C4) can reproduce JS semantics exactly.
  *
  * Parsing runs as a typed flatMap per partition — one pass, no driver
  * involvement, malformed rows dropped exactly like the reference (S2).
  */
object ObservationSource {

  // Jackson is on Spark's own classpath; mapper is thread-safe after config.
  @transient private lazy val om = new ObjectMapper()

  private def dtFormat(sep: Char) =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(s"yyyy-MM-dd'$sep'HH:mm:ss")
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
      .optionalEnd()
      .toFormatter()

  // 'T' or space separator; 0–9 fractional digits (not just 3/6)
  private val dtFormats = Seq(dtFormat('T'), dtFormat(' '))

  private[graft] def parseDatetime(s: String): Option[Timestamp] = {
    dtFormats.view.flatMap { f =>
      try Some(Timestamp.from(LocalDateTime.parse(s, f).toInstant(ZoneOffset.UTC)))
      catch { case _: Exception => None }
    }.headOption
  }

  /** Render one JSON scalar node as a tagged scalar with JS-canonical lexeme. */
  private def tag(n: JsonNode): TaggedScalar = {
    if (n.isBoolean) TaggedScalar(if (n.asBoolean) "true" else "false", "boolean")
    else if (n.isNumber) TaggedScalar(JsValues.jsNumberString(n.asDouble), "number")
    else if (n.isTextual) TaggedScalar(n.asText, "string")
    else if (n.isNull) TaggedScalar("null", "null") // Number(null)=0, String(null)="null"
    else TaggedScalar(n.toString, "string") // nested values: carried as text
  }

  /** Parse one observation JSON document; None = malformed (dropped, S2). */
  def parseObservation(json: String): Option[ObservationRow] = {
    try {
      val root = om.readTree(json)
      if (root == null || !root.isObject) return None
      val data: Map[String, TaggedScalar] = Option(root.get("data")) match {
        case Some(d) if d.isObject =>
          // properties() is the ObjectNode's ordered entrySet — DOCUMENT
          // order (same `_children.entrySet()` the deprecated fields()
          // wrapped; verified in the shipped jackson-databind 2.21
          // bytecode). Iterate it AS AN ITERATOR: Scala's `.map` over the
          // java Set wrapper would rebuild a HashSet and scramble the
          // order (caught by the dead-letter key-order golden). VectorMap
          // then preserves it so `pos` from posexplode matches JS
          // object-key insertion order (semantic for dead-letter JSON and
          // event results ordering).
          scala.collection.immutable.VectorMap.from(
            d.properties().iterator().asScala
              .map(e => e.getKey -> tag(e.getValue)))
        case _ => Map.empty[String, TaggedScalar]
      }
      val dt = Option(root.get("datetime")).map(_.asText).flatMap(parseDatetime)
      Some(ObservationRow(
        network = Option(root.get("network")).map(_.asText).orNull,
        node_id = Option(root.get("node_id")).map(_.asText).orNull,
        meta_id = Option(root.get("meta_id")).map(_.asLong).getOrElse(0L),
        datetime = dt.orNull,
        sensor = Option(root.get("sensor")).map(_.asText).orNull,
        data = data))
    } catch { case _: Exception => None }
  }

  /** Batch/stream parse: DataFrame with a string `value` column →
    * Dataset[ObservationRow]. Works identically on a streaming DataFrame. */
  def parse(raw: DataFrame): Dataset[ObservationRow] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select("value").as[String].flatMap(parseObservation _)
  }

  /** Convenience: read newline-delimited JSON files as observations. */
  def readJsonLines(spark: SparkSession, path: String): Dataset[ObservationRow] =
    parse(spark.read.text(path))

  /** The PRODUCTION connector wiring, as library code: a Kafka/Kinesis
    * connector stream yields `key binary, value binary, topic string,
    * partition int, offset long, timestamp, timestampType` — this is the
    * `spark.readStream.format("kafka")` output contract. The payload
    * contract is `CAST(value AS STRING)` (UTF-8 decode of the record
    * bytes; the reference decodes base64 Kinesis payloads to the same JSON
    * text at app/consumer/kcl_app.js:36-50) and every other connector
    * column is dropped — offsets/partitions are the TRANSPORT's replay
    * bookkeeping, handled by checkpointing (X1), never by the dataflow.
    * Works identically on batch and streaming relations; the real
    * connector swap is `spark.readStream.format("kafka").option(...)
    * .load()` piped here, a call-site change only (no connector jars in
    * this sandbox — the contract is pinned by a Kafka-shaped in-memory
    * stream in StreamingSpec). */
  def fromConnector(connectorDf: DataFrame): Dataset[ObservationRow] =
    parse(connectorDf.selectExpr("CAST(value AS STRING) AS value"))
}
