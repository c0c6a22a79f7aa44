package graft

import graft.operators.{EventOps, SimilarityOps, StarOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions — the 100 TB design contract: filters reach the
  * parquet scan, dimension joins broadcast, top-k avoids a global sort,
  * aggregations are partial (map-side combine) before the shuffle. */
class PlanSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def planString(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan
    val resolved = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // formatted explain includes PushedFilters and node names
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q1: shipdate filter pushed to parquet scan + partial aggregation") {
    val s = planString(StarOps.q1Agg(spark, dir))
    assert(s.contains("PushedFilters"), s)
    assert(s.contains("l_shipdate"), "filter column missing from scan info")
    // partial-then-final hash aggregate (map-side combine before shuffle)
    assert("HashAggregate".r.findAllIn(s).size >= 2, s)
  }

  test("q1: scan reads only the 5 needed columns of 11") {
    val s = planString(StarOps.q1Agg(spark, dir))
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_quantity"), readSchema)
  }

  test("q3: customer dimension joins as broadcast") {
    val s = planString(StarOps.q3Join(spark, dir))
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("q5: all dimension joins broadcast — no shuffle join anywhere") {
    val s = planString(StarOps.q5Region(spark, dir))
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"),
      "q5 should broadcast every dimension at this scale:\n" + s)
  }

  test("topk: TakeOrderedAndProject, not a global sort") {
    val s = planString(StarOps.topkOrders(spark, dir))
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("catalog enrichment join broadcasts the catalog side") {
    val s = planString(EventOps.j2Enrich(spark, dir))
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("knn: query side broadcasts (nested-loop on broadcast, corpus scanned once)") {
    val s = planString(SimilarityOps.knnBruteForce(spark, dir))
    assert(s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("events scan prunes columns for the pivot") {
    val s = planString(EventOps.k1Pivot(spark, dir))
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), readSchema)
    assert(!readSchema.contains("value"), readSchema)
  }
}
