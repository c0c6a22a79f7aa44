package graft.operators

import graft.catalog.MetadataCatalog
import graft.functions.Coerce
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's whole dataflow (SURVEY.md §2) as composable, purely
  * declarative DataFrame transforms over ONE exploded pair relation:
  *
  *   (network, node_id, meta_id, datetime, sensor,   -- obs identity
  *    pos, key, lex, jstype,                          -- one data pair
  *    feature, property, ptype,                       -- enrichment (J2)
  *    value, error)                                   -- coercion (C4)
  *
  * The reference routes per-PAIR, not per-record (one observation can feed
  * both the feature tables and the dead-letter table, app/mapper.js:250-272,
  * with recursion at :269-271). Set algebra over the pair relation replaces
  * the recursion: `valid` and `misfit` are two filters of the same relation.
  *
  * Scale: the fact side is arbitrarily large; the catalog side is tiny and
  * broadcast. Nothing here shuffles except the per-observation regroups
  * (A1/K1/K2), which are keyed on the observation identity — at 100 TB those
  * become map-side-combinable hash aggregations partitioned by the stream's
  * natural source partitioning; no driver collects anywhere.
  */
object Pipeline {

  import graft.model.Observation.obsCols

  private val obs: Seq[Column] = obsCols.map(col)

  /** P1 — normalization projection (app/mapper.js:60-68): lowercase node_id,
    * sensor, and every data key (value-preserving key rewrite; duplicate keys
    * after folding resolve last-wins like JS assignment — requires
    * spark.sql.mapKeyDedupPolicy=LAST_WIN, set by Engine). network is NOT
    * lowercased (the reference's comment says it is; the code does not). */
  def normalize(observations: DataFrame): DataFrame =
    observations
      .withColumn("node_id", lower(col("node_id")))
      .withColumn("sensor", lower(col("sensor")))
      .withColumn("data", transform_keys(col("data"), (k, _) => lower(k)))

  /** Explode the data map into the pair relation, preserving insertion order
    * (`pos`) — JS object-key order is semantic for the sinks' output. */
  def explodePairs(observations: DataFrame): DataFrame =
    observations.select(
      obs :+ posexplode_outer(col("data")): _*)
      .select(obs ++ Seq(col("pos"), col("key"),
        col("value.lex").as("lex"), col("value.jstype").as("jstype")): _*)

  /** J1+J2 — broadcast equi-join against the catalog: attaches
    * (feature, property, ptype); unmatched pairs (unknown sensor or unknown
    * key) keep feature NULL, which IS the validation anti-join result
    * (app/mapper.js:411-419 / 159-179). */
  def enrich(pairs: DataFrame, catalog: MetadataCatalog): DataFrame = {
    val m = broadcast(catalog.mappingsDF(pairs.sparkSession)
      .withColumnRenamed("sensor", "c_sensor")
      .withColumnRenamed("key", "c_key"))
    pairs.join(m,
      pairs("sensor") === m("c_sensor") && pairs("key") === m("c_key"),
      "left")
      .drop("c_sensor", "c_key")
  }

  /** C4 — exact JS coercion (see Coerce): adds value + error columns. */
  def coerce(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("coerced",
        Coerce.coerce(col("lex"), col("jstype"), col("ptype")))
      .select(enriched.columns.toIndexedSeq.map(col) ++
        Seq(col("coerced.value").as("value"), col("coerced.error").as("error")): _*)

  /** R1 — router: a pair is a misfit iff its key has no catalog mapping OR
    * its value failed coercion (app/mapper.js:250-272). */
  def classify(coerced: DataFrame): DataFrame =
    coerced.withColumn("misfit", col("feature").isNull || col("error"))

  def validPairs(classified: DataFrame): DataFrame =
    classified.filter(!col("misfit") && col("key").isNotNull)

  def misfitPairs(classified: DataFrame): DataFrame =
    classified.filter(col("misfit"))

  /** Full fused pair relation from raw observations. One pass: normalize →
    * explode → broadcast-join → coerce → classify; Catalyst fuses everything
    * but the join build into a single WholeStageCodegen span. */
  def pairRelation(observations: DataFrame, catalog: MetadataCatalog): DataFrame =
    classify(coerce(enrich(explodePairs(normalize(observations)), catalog)))

  // ---------------------------------------------------------------------------
  // Sink-shaped outputs
  // ---------------------------------------------------------------------------

  /** JSON-escape a string for the dead-letter/event blobs: backslash,
    * quote, and ALL control chars below 0x20 (JSON.stringify parity —
    * named escapes for the common ones, \u00XX for the rest). */
  private def jsonEscape(c: Column): Column = {
    val named = Seq("\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"", "\n" -> "\\\\n",
      "\t" -> "\\\\t", "\r" -> "\\\\r", "\b" -> "\\\\b", "\f" -> "\\\\f")
    val escapedNamed = named.foldLeft(c) { case (col0, (from, to)) =>
      regexp_replace(col0, from, to)
    }
    // remaining control characters → \u00XX
    (0 until 0x20).filterNot(Seq(0x08, 0x09, 0x0a, 0x0c, 0x0d).contains)
      .foldLeft(escapedNamed) { (col0, cp) =>
        regexp_replace(col0, f"\\x$cp%02x", f"\\\\u$cp%04x")
      }
  }

  /** Render the ORIGINAL (pre-coercion) value the way JSON.stringify does:
    * numbers/booleans/null bare, strings quoted. (A JSON null under an
    * int/bool-typed property is a misfit pair; stringify emits `"k":null`,
    * not `"k":"null"`.) */
  private def rawJsonValue: Column =
    when(col("jstype").isin("number", "boolean", "null"), col("lex"))
      .otherwise(concat(lit("\""), jsonEscape(col("lex")), lit("\"")))

  /** K2 — dead-letter rows: one per observation with ≥1 misfit pair; `data`
    * is the JSON of the bad pairs in original key order with original values
    * (app/mapper.js:306-310; golden tests/travis_tests/unit_tests.js:55-71). */
  def misfits(classified: DataFrame): DataFrame =
    misfitPairs(classified)
      // empty-data observations yield one null-key row via posexplode_outer;
      // the reference writes nothing for them (no keys ⇒ no invalid keys)
      .filter(col("key").isNotNull)
      .withColumn("entry",
        struct(col("pos"),
          concat(lit("\""), jsonEscape(col("key")), lit("\":"), rawJsonValue)
            .as("kv")))
      .groupBy(obs: _*)
      .agg(array_sort(collect_list(col("entry"))).as("entries"))
      .withColumn("data",
        concat(lit("{"),
          concat_ws(",", transform(col("entries"), _.getField("kv"))),
          lit("}")))
      .drop("entries")

  /** A1 — unpivot + regroup by feature: one row per (observation × feature)
    * with results = {property → coerced value}, feature order = first
    * appearance, property order = key insertion order
    * (app/mapper.js:382-403). `results` carries canonical string renderings;
    * event JSON rendering happens sink-side. */
  def featureObservations(classified: DataFrame): DataFrame =
    validPairs(classified)
      .withColumn("entry", struct(col("pos"), col("property"), col("value"),
        col("jstype"), col("ptype")))
      .groupBy(obs :+ col("feature"): _*)
      .agg(
        min(col("pos")).as("feature_pos"),
        map_from_entries(transform(array_sort(collect_list(col("entry"))),
          e => struct(e.getField("property"), e.getField("value")))).as("results"))

  /** Literal (feature, property) -> declared-type lookup map, NUL-separated
    * compound key (NUL cannot occur in catalog identifiers). Shared by the
    * event JSON renderer and the SQL-text sink (SqlText). */
  def ptypeMap(catalog: MetadataCatalog): Column =
    map(catalog.featureProps.flatMap(p =>
      Seq(lit(p.feature + "\u0000" + p.property), lit(p.ptype))): _*)

  /** K3 — publisher event payloads: exact JSON the reference emits
    * (feature, node, sensor, datetime, network, results) with coerced values
    * typed (numbers bare, bools bare, strings quoted). */
  def eventJson(featureObs: DataFrame, catalog: MetadataCatalog): DataFrame = {
    // re-derive bare-vs-quoted from the declared type of each property
    val typesMap = ptypeMap(catalog)
    featureObs.withColumn("event_json",
      concat(
        lit("{\"feature\":\""), col("feature"),
        lit("\",\"node\":\""), col("node_id"),
        lit("\",\"sensor\":\""), col("sensor"),
        lit("\",\"datetime\":\""), date_format(col("datetime"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        lit("\",\"network\":\""), col("network"),
        lit("\",\"results\":{"),
        concat_ws(",", transform(map_entries(col("results")), e =>
          concat(lit("\""), e.getField("key"), lit("\":"),
            when(element_at(typesMap,
                concat(col("feature"), lit("\u0000"), e.getField("key")))
                .isin("varchar", "string"),
              concat(lit("\""), jsonEscape(e.getField("value")), lit("\"")))
              .otherwise(e.getField("value"))))),
        lit("}}")))
  }

  /** K1 — pivot-to-wide for one (network, feature): catalog-driven columns
    * (absent properties exist as typed NULLs), obs identity + one column per
    * declared property, cast to the declared Spark type
    * (DDL tests/configure_tests.js:79-161). */
  def widen(classified: DataFrame, catalog: MetadataCatalog,
      feature: String): DataFrame = {
    val props = catalog.propsOf(feature)
    val wide = validPairs(classified)
      .filter(col("feature") === feature)
      .groupBy(obs: _*)
      .pivot("property", props.map(_.property))
      .agg(first(col("value")))
    props.foldLeft(wide) { (df, p) =>
      df.withColumn(p.property, col(s"`${p.property}`").cast(sparkType(p.ptype)))
    }.withColumn("meta_id", col("meta_id").cast("double"))
  }

  /** K1 off the ALREADY-AGGREGATED relation: typed wide projection of one
    * feature from featureObservations' `results` map — a narrow map job
    * (element_at per declared property), no pivot, no second aggregation.
    * Lets a sink derive every wide table from ONE shared featureObservations
    * pass instead of re-running the pair relation per feature. */
  def widenFromResults(featureObs: DataFrame, catalog: MetadataCatalog,
      feature: String): DataFrame = {
    val props = catalog.propsOf(feature)
    featureObs.filter(col("feature") === feature)
      .select(obs ++ props.map(p =>
        element_at(col("results"), p.property).cast(sparkType(p.ptype))
          .as(p.property)): _*)
      .withColumn("meta_id", col("meta_id").cast("double"))
  }

  /** Declared SQL type → Spark type (sink-side DDL parity:
    * tests/configure_tests.js:79-161 uses VARCHAR/DOUBLE/INT/BOOL columns). */
  def sparkType(ptype: String): String = ptype match {
    case "varchar" | "string" => "string"
    case "integer" | "int" => "int"
    case "float" | "double" | "double precision" => "double"
    case "bool" | "boolean" => "boolean"
    case _ => "string"
  }

  // ---------------------------------------------------------------------------
  // Alert derivation (G1 inputs — the stateful dedup lives in streaming)
  // ---------------------------------------------------------------------------

  /** Per-observation error summary: alert_type ∈ does_not_exist | invalid_key
    * | NULL (clean). An unknown sensor ⇒ every pair unmatched AND the sensor
    * absent from the catalog (app/mapper.js:78-104). */
  def observationStatus(classified: DataFrame, catalog: MetadataCatalog): DataFrame = {
    val knownSensors = catalog.sensors.toSeq
    classified
      .groupBy(obs: _*)
      .agg(
        sum(when(col("misfit"), 1).otherwise(0)).as("n_bad"),
        count(lit(1)).as("n_pairs"))
      .withColumn("sensor_known",
        coalesce(col("sensor").isin(knownSensors: _*), lit(false)))
      .withColumn("alert_type",
        when(!col("sensor_known"), lit("does_not_exist"))
          .when(col("n_bad") > 0, lit("invalid_key"))
          .otherwise(lit(null).cast("string")))
  }
}
