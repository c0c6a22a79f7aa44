package graft.operators

import graft.catalog.MetadataCatalog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K1/K2 sink-side SQL-text generation — the reference's exact quoted
  * INSERT statements (app/mapper.js:306-358, pinned by the goldens in
  * tests/travis_tests/unit_tests.js:54-161), generated as codegen'd column
  * expressions over the pipeline's relations: the text assembly is
  * distributed, never driver-side.
  *
  * Fidelity notes:
  *  - property identifiers are double-quoted — digit-leading names like
  *    "500nm" require it (mapper.js:330-332);
  *  - varchar values single-quoted, bools rendered TRUE/FALSE
  *    (String(v).toUpperCase(), mapper.js:344-351), numbers bare;
  *  - column and value order is the observation's document key order;
  *  - datetime renders as the ISO-'T' micros form the reference carries in
  *    obs.datetime ('2016-08-05T00:00:08.246000'); inputs whose original
  *    lexeme used a different fraction width re-canonicalize to 6 digits;
  *  - the emitted text ends with ';' exactly like the reference — JDBC
  *    executors strip the terminator before Statement.execute.
  *
  * Two DELIBERATE divergences where the reference's raw util.format
  * interpolation emits broken SQL (goldens unaffected by either):
  *  - apostrophes inside quoted values are SQL-standard doubled ('' —
  *    the reference would emit malformed/injectable text for "o'clock");
  *  - null fields render as the literal text null the way
  *    util.format('%s', null) does, instead of nulling out the whole
  *    statement (a null network reaches the dead-letter sink by design).
  */
object SqlText {

  private def dtCol: Column =
    date_format(col("datetime"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** util.format('%s', v) parity: null renders as the text `null`. */
  private def jsStr(c: Column): Column = coalesce(c.cast("string"), lit("null"))

  /** SQL-quote a value: apostrophes doubled (divergence note above). */
  private def sqlQuoted(c: Column): Column =
    concat(lit("'"), regexp_replace(jsStr(c), "'", "''"), lit("'"))

  /** INSERT text per (observation × feature) row of
    * Pipeline.featureObservations (mapper.js:319-358). Adds a `sql` column. */
  def featureInsertText(featureObs: DataFrame,
      catalog: MetadataCatalog): DataFrame = {
    val typesMap = Pipeline.ptypeMap(catalog)
    val entries = map_entries(col("results")) // document (pos) order
    val colList = concat_ws(", ",
      transform(entries, e => concat(lit("\""), e.getField("key"), lit("\""))))
    val valList = concat_ws(", ", transform(entries, { e =>
      val t = element_at(typesMap,
        concat(col("feature"), lit("\u0000"), e.getField("key")))
      when(t.isin("varchar", "string"), sqlQuoted(e.getField("value")))
        .when(t.isin("bool", "boolean"), upper(e.getField("value")))
        .otherwise(e.getField("value"))
    }))
    featureObs.withColumn("sql", concat(
      lit("INSERT INTO "), jsStr(col("network")), lit("__"),
      jsStr(lower(col("feature"))),
      lit(" (node_id, datetime, meta_id, sensor, "), colList,
      lit(") VALUES ("), sqlQuoted(col("node_id")), lit(", "),
      sqlQuoted(dtCol), lit(", "), jsStr(col("meta_id")), lit(", "),
      sqlQuoted(col("sensor")), lit(", "), valList, lit(");")))
  }

  /** INSERT text per dead-letter row of Pipeline.misfits
    * (mapper.js:306-310). Adds a `sql` column. */
  def misfitInsertText(misfits: DataFrame): DataFrame =
    misfits.withColumn("sql", concat(
      lit("INSERT INTO "), jsStr(col("network")),
      lit("__unknown_feature VALUES ("), sqlQuoted(col("node_id")),
      lit(", "), sqlQuoted(dtCol), lit(", "), jsStr(col("meta_id")),
      lit(", "), sqlQuoted(col("sensor")), lit(", "),
      sqlQuoted(col("data")), lit(");")))
}
