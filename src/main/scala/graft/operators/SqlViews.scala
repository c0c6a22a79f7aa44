package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface plumbing: registers each relation under a PER-CALL unique
  * temp view name, renders the query with those names, and drops the
  * views as soon as analysis has resolved them into the plan.
  *
  * Why not fixed names: temp views are session-global, so two concurrent
  * queries on one session pointed at different data dirs would race on
  * the view definitions (one query silently reads the other's tables) —
  * and never-dropped views leak catalog entries for the session
  * lifetime. Unique names make each call self-contained; dropping right
  * after `spark.sql` is safe because view resolution happens during
  * analysis, inside that call.
  */
private[operators] object SqlViews {

  /** Registers `views` under unique names, passes the name mapping to
    * `sql` (keyed by the caller's logical names), runs it, then drops
    * the views. */
  def withViews(spark: SparkSession, views: (String, DataFrame)*)(
      sql: Map[String, String] => String): DataFrame = {
    val tag = UUID.randomUUID.toString.replace("-", "")
    val names = views.map { case (n, _) => n -> s"${n}_$tag" }.toMap
    views.foreach { case (n, df) => df.createOrReplaceTempView(names(n)) }
    try spark.sql(sql(names))
    finally names.values.foreach(spark.catalog.dropTempView(_))
  }
}
