package graft

import graft.catalog.MetadataCatalog
import graft.model.{ObservationRow, TaggedScalar}
import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}
import scala.collection.immutable.VectorMap

/** The reference's test fixtures, transcribed from
  * tests/travis_tests/unit_tests.js:13-52 (catalogs) and
  * tests/travis_tests/integration_tests.js:110-207 (8 canonical
  * observations). See FIXTURES.md.
  */
object Fixtures {

  val catalog: MetadataCatalog = MetadataCatalog.fromMaps(
    sensorMap = Map(
      "htu21d" -> Map(
        "temperature" -> "temperature.temperature",
        "temp" -> "temperature.temperature",
        "humidity" -> "relative_humidity.humidity"),
      "hmc5883l" -> Map(
        "x" -> "magnetic_field.x",
        "y" -> "magnetic_field.y",
        "z" -> "magnetic_field.z"),
      "camera" -> Map(
        "standing_water" -> "computer_vision.standing_water",
        "cloud_type" -> "computer_vision.cloud_type",
        "num_pedestrians" -> "computer_vision.num_pedestrians",
        "traffic_density" -> "computer_vision.traffic_density")),
    featureMap = Map(
      "temperature" -> Seq("temperature" -> "float"),
      "relative_humidity" -> Seq("humidity" -> "float"),
      "magnetic_field" -> Seq("x" -> "float", "y" -> "float", "z" -> "float"),
      "computer_vision" -> Seq(
        "standing_water" -> "bool", "cloud_type" -> "varchar",
        "num_pedestrians" -> "integer", "traffic_density" -> "float")))

  def ts(s: String): Timestamp =
    Timestamp.from(LocalDateTime.parse(s).toInstant(ZoneOffset.UTC))

  val t0: Timestamp = ts("2017-01-01T00:00:00")

  def num(lex: String) = TaggedScalar(lex, "number")
  def str(lex: String) = TaggedScalar(lex, "string")
  def bool(b: Boolean) = TaggedScalar(b.toString, "boolean")

  private val aot = "array_of_things_chicago"

  /** The 8 canonical observations (integration_tests.js:110-207). */
  val observations: Seq[ObservationRow] = Seq(
    ObservationRow(aot, "001", 23, t0, "HTU21D",
      VectorMap("Temp" -> num("37.91"), "Humidity" -> num("27.48"))),
    ObservationRow(aot, "002", 23, t0, "HMC5883L",
      VectorMap("Y" -> num("32.11"), "Z" -> num("90.92"))),
    ObservationRow(aot, "003", 23, t0, "HMC5883L",
      VectorMap("x1" -> num("56.77"), "y1" -> num("32.11"), "Z" -> num("90.92"))),
    ObservationRow(aot, "004", 23, t0, "camera",
      VectorMap("standing_water" -> num("10"), "cloud_type" -> str("cumulonimbus"),
        "num_pedestrians" -> num("9"), "traffic_density" -> num("0.38"))),
    ObservationRow(aot, "005", 23, t0, "HTU21D",
      VectorMap("Temp" -> str("high"), "Humdrum" -> num("27.48"))),
    ObservationRow(aot, "006", 23, t0, "wubdb89",
      VectorMap("intensity" -> num("90"))),
    ObservationRow(aot, "007", 23, t0, "camera",
      VectorMap("standing_water" -> bool(true), "cloud_type" -> str("cumulonimbus"),
        "num_pedestrians" -> num("11"), "traffic_density" -> num("0.22"))),
    ObservationRow("internet_of_stuff_seattle", "008", 12, t0, "HTU21D",
      VectorMap("Temperature" -> num("40.01"))))
}
