package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the most recent right
  * row with the same key and right.time <= left.time.
  *
  * Spark has no native as-of join; rather than a custom SparkPlan, this
  * composes built-ins the way a sort-merge as-of executes anyway:
  * union-tag both sides, one shuffle by key, sort by (time, side) within
  * key, and carry the latest right payload forward with last(ignoreNulls)
  * over the running window. One shuffle + one sort — the same cost profile
  * as a dedicated as-of operator, with Catalyst handling spill/codegen.
  *
  * Ties (right.time == left.time) match, mirroring ASOF JOIN >= semantics
  * (right side sorts before left at equal timestamps).
  *
  * Null corner: window partitioning groups NULL keys into one partition
  * and sorts NULL times first, so null-keyed (or null-timed) left rows
  * can pick up null-keyed/null-timed right payloads here — SQL ASOF (and
  * [[asofNative]]) never match null keys or null times. Callers with
  * nullable keys/times who need SQL semantics should filter or use the
  * native operator.
  */
object AsOfJoin {

  /** @param left       fact side (keeps all its columns)
    * @param right      lookup side
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on left
    * @param rightTime  event-time column on right
    * @param rightCols  right columns to carry (renamed as given)
    * @param inner      drop left rows with no prior right match
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Map[String, String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c => col(c)) ++
        rightCols.values.toSeq.map(c => lit(null).cast(
          right.schema(rightCols.find(_._2 == c).get._1).dataType).as(c)): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map { case (from, to) => col(from).as(to) }.toSeq: _*)
    val unioned = l.unionByName(r)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightCols.values.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val res = carried.filter(col("_side") === 1)
      .withColumnRenamed("_k", key)
      .drop("_t", "_side")
    if (inner) res.filter(rightCols.values.map(col(_).isNotNull).reduce(_ && _))
    else res
  }

  /** The NATIVE as-of join — same contract as [[asof]], executed by the
    * custom Catalyst operator (`graft.plans.AsOfJoinPlan` →
    * `AsOfJoinStrategy` → `AsOfJoinExec`): hash-clustered children,
    * (key, time) sort, one O(|L|+|R|) merge pass per partition with a
    * single buffered candidate per key — no union, no window state. Spec
    * + oracle pin it result-identical to the compositional twin.
    *
    * The strategy self-registers on the session's public
    * `experimental.extraStrategies` hook (idempotent), so plain sessions
    * work; sessions configured with `spark.sql.extensions=
    * graft.functions.GraftExtensions` get it injected at build time. */
  def asofNative(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Map[String, String], inner: Boolean = true): DataFrame = {
    import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy, PushFilterThroughAsOf}
    import org.apache.spark.sql.graft.DatasetBridge
    val spark = left.sparkSession
    // check-then-append under a lock: concurrent first calls on one
    // session would otherwise both pass the contains() check and register
    // the strategy/rule twice (harmless for results, but every subsequent
    // plan pays the duplicate optimizer pass)
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
      if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOf))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ PushFilterThroughAsOf
    }
    // no analyzer coercion runs on a hand-built node: mismatched key/time
    // types would otherwise surface as executor-side ClassCastExceptions
    // (or worse, different hash partitionings per side)
    def requireSameType(what: String, l: String, r: String): Unit = {
      val lt = left.schema(l).dataType
      val rt = right.schema(r).dataType
      require(org.apache.spark.sql.types.DataType.equalsStructurally(
          lt, rt, ignoreNullability = true),
        s"asofNative $what types differ: left $l is $lt, right $r is $rt")
    }
    requireSameType("key", key, key)
    requireSameType("time", leftTime, rightTime)
    // payload attributes are resolved by name after the projection below,
    // so a target name colliding with the internal aliases (or another
    // target) would silently bind the wrong attribute — fail loudly instead
    val targets = rightCols.values.toSeq
    require(targets.distinct.size == targets.size,
      s"asofNative rightCols target names must be distinct: $targets")
    require(!targets.exists(Set("_r_k", "_r_t")),
      s"asofNative rightCols targets may not use reserved names _r_k/_r_t: $targets")
    // fresh-alias the right side so the node's output attribute ids are
    // disjoint from the left's even on a self-as-of (both frames derived
    // from one scan — the exact shape of the reference's usage)
    val rightProj = right.select(
      col(key).as("_r_k") +: col(rightTime).as("_r_t") +:
        rightCols.map { case (from, to) => col(from).as(to) }.toSeq: _*)
    val lPlan = DatasetBridge.analyzed(left)
    val rPlan = DatasetBridge.analyzed(rightProj)
    val lOut = lPlan.output
    val rOut = rPlan.output
    def attr(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
        name: String) = out.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not found"))
    val payload = rightCols.values.toSeq.map(attr(rOut, _))
    DatasetBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lOut, key), attr(lOut, leftTime),
        attr(rOut, "_r_k"), attr(rOut, "_r_t"),
        payload, inner))
  }
}
