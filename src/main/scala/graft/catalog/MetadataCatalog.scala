package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two-level, runtime-mutable schema registry driving the pipeline
  * (reference: app/mapper.js:120-180, tests/configure_tests.js:36-76).
  *
  *  - sensor catalog:  sensor name → (raw data key → "feature.property")
  *  - feature catalog: feature name → ordered (property → declared SQL type)
  *
  * Loaded from small DataFrames (parquet/JDBC stand-in or in-memory seq),
  * lowercase-normalized exactly as the reference does on load
  * (mapper.js:139-140: sensor names and the whole mapping json lowercased;
  * mapper.js:169-172: feature, property, type lowercased).
  *
  * Exposed denormalized as a single broadcastable mapping relation:
  *   mappings(sensor, key, feature, property, ptype)
  * which is the build side of both the validation anti-join (J1) and the
  * enrichment join (J2). At 100 TB the fact stream is huge but this catalog
  * is tiny (thousands of rows) — broadcast-hash-join territory, re-read per
  * micro-batch for the reference's refresh-on-miss semantics (G2).
  */
final case class MetadataCatalog(
    /** (sensor, key) → feature/property/type, lowercased. */
    mappings: Seq[MetadataCatalog.Mapping],
    /** ordered pivot columns per feature: (feature, property, ptype, pos). */
    featureProps: Seq[MetadataCatalog.FeatureProp],
    /** all registered sensor names, incl. sensors with ZERO key mappings —
      * the reference keeps such a sensor in `map`, so its observations are
      * invalid_key (unknown keys), not does_not_exist. */
    registeredSensors: Set[String] = Set.empty) {

  import MetadataCatalog._

  def mappingsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    mappings.toDF()
  }

  def featurePropsDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    featureProps.toDF()
  }

  /** Known sensor names (a sensor absent here ⇒ does_not_exist alert). */
  def sensors: Set[String] = registeredSensors ++ mappings.map(_.sensor)

  /** Features observed by a given sensor. */
  def featuresOf(sensor: String): Set[String] =
    mappings.filter(_.sensor == sensor).map(_.feature).toSet

  /** Ordered properties of a feature — the wide-table column set (K1). */
  def propsOf(feature: String): Seq[FeatureProp] =
    featureProps.filter(_.feature == feature).sortBy(_.pos)
}

object MetadataCatalog {

  /** One (sensor, key) → feature.property mapping with its declared type.
    * `ptype` is null when the feature/property has no type declared (the
    * reference would throw a TypeError looking it up; we surface it as an
    * unknown-type coercion error, same observable routing). */
  final case class Mapping(sensor: String, key: String, feature: String,
      property: String, ptype: String)

  final case class FeatureProp(feature: String, property: String,
      ptype: String, pos: Int)

  /** Split "feature.property" exactly like the reference:
    * feature = text before first '.', property = everything after it
    * (mapper.js:196-197: split('.')[0] / split(/\.(.+)?/)[1]). */
  def splitFeatureProperty(fp: String): (String, String) = {
    val i = fp.indexOf('.')
    if (i < 0) (fp, null) else (fp.substring(0, i), fp.substring(i + 1))
  }

  /** Build from in-memory maps (test fixtures / collected JDBC rows). */
  def fromMaps(
      sensorMap: Map[String, Map[String, String]],
      featureMap: Map[String, Seq[(String, String)]]): MetadataCatalog = {
    val typeOf: Map[(String, String), String] =
      featureMap.flatMap { case (f, props) =>
        props.map { case (p, t) =>
          (f.toLowerCase, p.toLowerCase) -> t.toLowerCase }
      }
    val mappings = sensorMap.toSeq.sortBy(_._1).flatMap { case (sensor, keys) =>
      keys.toSeq.map { case (k, fp) =>
        val (f, p) = splitFeatureProperty(fp.toLowerCase)
        Mapping(sensor.toLowerCase, k.toLowerCase, f, p,
          typeOf.getOrElse((f, Option(p).getOrElse("")), null))
      }
    }
    val featureProps = featureMap.toSeq.sortBy(_._1).flatMap { case (f, props) =>
      props.zipWithIndex.map { case ((p, t), i) =>
        FeatureProp(f.toLowerCase, p.toLowerCase, t.toLowerCase, i)
      }
    }
    MetadataCatalog(mappings, featureProps,
      registeredSensors = sensorMap.keySet.map(_.toLowerCase))
  }

  /** Load from two catalog DataFrames with the reference's shapes:
    *   sensors(name string, observed_properties map<string,string>)
    *   features(name string, observed_properties array<struct<name,type>>)
    * Collected to the driver — the catalog is small by construction (it is
    * the reference's in-process dict); broadcast back out for the joins.
    */
  def fromDataFrames(sensors: DataFrame, features: DataFrame): MetadataCatalog = {
    val sensorMap: Map[String, Map[String, String]] =
      sensors.select("name", "observed_properties").collect().map { r =>
        r.getString(0) -> r.getMap[String, String](1).toMap
      }.toMap
    val featureMap: Map[String, Seq[(String, String)]] =
      features.select("name", "observed_properties").collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getString(0), p.getString(1)))
      }.toMap
    fromMaps(sensorMap, featureMap)
  }

  /** Parquet stand-in for the reference's Postgres catalog scan (S3). */
  def fromParquet(spark: SparkSession, sensorPath: String,
      featurePath: String): MetadataCatalog =
    fromDataFrames(spark.read.parquet(sensorPath), spark.read.parquet(featurePath))

  /** Live-JDBC catalog scan — the reference's actual Postgres read path
    * (`SELECT * FROM sensor__sensor_metadata` / `sensor__feature_metadata`,
    * app/mapper.js:131-147/159-179, seeded by tests/configure_tests.js:
    * 38-75). Both tables are KB-scale by construction, so a single-partition
    * `spark.read.jdbc` is the right shape — the result is collected and
    * broadcast back out like every other catalog load. The
    * `observed_properties` payloads arrive as JSON text and parse with the
    * same shapes the parquet loader reads natively. */
  def fromJdbc(spark: SparkSession, url: String,
      sensorTable: String = "sensor__sensor_metadata",
      featureTable: String = "sensor__feature_metadata",
      properties: java.util.Properties = new java.util.Properties)
      : MetadataCatalog = {
    import org.apache.spark.sql.types._
    val sensors = spark.read.jdbc(url, sensorTable, properties)
      .select(col("name"),
        from_json(col("observed_properties"),
          MapType(StringType, StringType)).as("observed_properties"))
    val features = spark.read.jdbc(url, featureTable, properties)
      .select(col("name"),
        from_json(col("observed_properties"), ArrayType(StructType(Seq(
          StructField("name", StringType),
          StructField("type", StringType))))).as("observed_properties"))
    fromDataFrames(sensors, features)
  }
}
