package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Additional relational coverage: rollup, semi-join, as-of join, range
  * (interval) join, SQL-API entry, and a custom typed Aggregator — the
  * operator categories a complete engine offers beyond the reference's
  * streaming dataflow. All oracle-checked.
  */
object ExtraOps {

  import EventOps.tbl

  /** ROLLUP aggregation (grouping sets): subtotals + grand total. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity")), 0).cast("long").as("sum_qty"),
        count(lit(1)).as("n"))

  /** Left-semi join: customers having ≥1 order in 1998 (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord98 = tbl(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    tbl(spark, dir, "customer")
      .join(ord98, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** As-of join: each error event matched to the user's most recent
    * signup at-or-before it; gap in exact microseconds. */
  def asofErrorSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts0"))
    AsOfJoin.asof(errors, signups, key = "user_id",
        leftTime = "ts", rightTime = "signup_ts0",
        rightCols = Map("signup_ts0" -> "signup_ts"))
      .select(col("event_id"), col("user_id"), col("ts"), col("signup_ts"),
        (unix_micros(col("ts")) - unix_micros(col("signup_ts"))).as("gap_us"))
  }

  /** Range (interval) self-join: ordered event pairs of the same user
    * within 60 seconds. Scalable shape: bucket time into 60 s cells, join
    * on (user, cell) with the left side exploded to 3 adjacent cells —
    * candidates ⊇ true pairs, each found exactly once, then exact filter.
    * No quadratic per-user blowup beyond the true neighborhood. */
  def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = tbl(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        (unix_micros(col("ts")).cast("long")).as("us"))
      .withColumn("cell", expr("us div 60000000"))
    val a = ev.select(col("user_id").as("u"), col("event_id").as("event_a"),
        col("us").as("us_a"), explode(array(col("cell") - 1, col("cell"),
          col("cell") + 1)).as("cell"))
    val b = ev.select(col("user_id").as("u"), col("event_id").as("event_b"),
      col("us").as("us_b"), col("cell"))
    a.join(b, Seq("u", "cell"))
      .filter(col("event_a") < col("event_b") &&
        abs(col("us_a") - col("us_b")) <= 60000000L)
      .select(col("u").as("user_id"), col("event_a"), col("event_b"),
        abs(col("us_a") - col("us_b")).as("gap_us"))
  }

  /** Sessionization: assign each event a per-user session sequence number
    * using the 30-minute-gap rule — lag to detect session starts, running
    * sum to number them. ROWS frame (not the default RANGE) so timestamp
    * ties — ordered deterministically by event_id — don't sum peers
    * together. One shuffle on user_id serves both window passes.
    * Null-timestamp events are excluded up front: engines disagree on both
    * null ordering (Spark nulls-first, DuckDB nulls-last) and NULL-gap
    * comparison, so a session number for them is not well-defined. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
    tbl(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("new_sess",
        when(gap.isNull || gap > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(wRun))
      .select(col("user_id"), col("event_id"),
        col("session_seq").cast("long").as("session_seq"))
  }

  /** SQL-API entry (TPC-H Q6 shape): revenue from discounted small lots —
    * exercises spark.sql + temp views end to end. */
  def sqlQ6(spark: SparkSession, dir: String): DataFrame = {
    tbl(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT CAST(round(sum(l_extendedprice * l_discount) * 10000, 0) AS LONG)
        |  AS revenue_dm
        |FROM lineitem_v
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |""".stripMargin)
  }

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition;
    * integer-valued quantities make the results exactly representable). */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      // one aggregation buffer for all three percentiles (array form), not
      // three independent TypedImperativeAggregates over the same column
      .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("ps"))
      .select(col("l_returnflag"), col("ps")(0).as("p25"),
        col("ps")(1).as("p50"), col("ps")(2).as("p75"))

  /** Correlated EXISTS (TPC-H Q4 shape): orders with ≥1 late lineitem,
    * counted per priority — exercises Catalyst's subquery decorrelation
    * (rewritten to a left-semi join; no per-row subquery execution). */
  def q4Exists(spark: SparkSession, dir: String): DataFrame = {
    tbl(spark, dir, "lineitem").createOrReplaceTempView("li_v")
    tbl(spark, dir, "orders").createOrReplaceTempView("ord_v")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM ord_v
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM li_v
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): revenue of small-lot
    * lineitems below 20% of their part's average quantity — decorrelates
    * to an aggregate + join. Exact-integer output. */
  def q17ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    tbl(spark, dir, "lineitem").createOrReplaceTempView("li_v")
    spark.sql(
      """SELECT CAST(round(sum(l_extendedprice) * 100, 0) AS LONG) AS total_c,
        |       count(*) AS n
        |FROM li_v outer_li
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM li_v
        |                    WHERE l_partkey = outer_li.l_partkey)""".stripMargin)
  }

  /** Custom typed Aggregator: quantity-weighted average extended price.
    * Buffer = (Σ price·qty, Σ qty); finish recovers exact integer cents
    * then emits hundredth-of-cent units (cross-engine exact). Input rows
    * are (returnflag, price, qty); the key is handled by groupByKey. */
  object WeightedAvgPrice
      extends Aggregator[(String, Double, Double), (Double, Double), Long] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (String, Double, Double)): (Double, Double) =
      (b._1 + a._2 * a._3, b._2 + a._3)
    def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Double)): Long = {
      val cents = Math.round(b._1 * 100).toDouble // exact integer recovery
      Math.floor(100.0 * cents / Math.round(b._2)).toLong
    }
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaDouble)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaLong
  }

  /** Per-key top-k via the BoundedTopK TypedImperativeAggregate: top-3
    * lineitems by extended price per supplier — map-side k-bounded heaps
    * instead of a full per-key sort (see BoundedTopK). Output exploded to
    * (suppkey, rank, price, id) rows for oracle comparison. */
  def topkPerKey(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        col("l_extendedprice"),
        (col("l_orderkey") * 100 + col("l_linenumber")).as("id"))
    li.groupBy("l_suppkey")
      .agg(graft.functions.BoundedTopK.topk(3, col("l_extendedprice"),
        col("id")).as("top"))
      .select(col("l_suppkey"), posexplode(col("top")))
      .select(col("l_suppkey"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("price"), col("col.id").as("id"))
  }

  /** Skew-safe two-phase (salted) aggregation: identical result to a
    * direct groupBy — demonstrated over the events table whose 15 user
    * keys are maximally hot. Phase 1 aggregates (key, salt) partials;
    * phase 2 combines per key. */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "events")
      .withColumn("salt", pmod(hash(col("event_id")), lit(16)))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("pn"),
        sum(col("value")).as("pv"))
      .groupBy("user_id")
      .agg(sum(col("pn")).cast("long").as("n"),
        round(sum(col("pv")) * 100, 0).cast("long").as("sum_value_c"))

  /** HLL sketch distinct counts (approx_count_distinct) next to exact —
    * approximate across engines, so spec-checked for relative error
    * rather than oracle-hashed. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  /** The Aggregator applied per return flag (typed groupByKey path). */
  def weightedAvgPrice(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tbl(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .agg(WeightedAvgPrice.toColumn.name("wavg_cc"))
      .toDF("l_returnflag", "wavg_cc")
  }
}
