package graft

import graft.operators.{ExtraOps, SimilarityOps, StarOps, TextOps}
import org.apache.spark.sql.DataFrame
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Golden physical plans for the headline queries — the whole-plan
  * complement to PlanSpec's targeted structural assertions: PlanSpec pins
  * ~45 specific facts (broadcasts, pushdowns, shuffle counts), this suite
  * pins EVERYTHING ELSE, so any silent plan change (a Spark upgrade, an
  * accidental hint, a builder refactor that re-orders joins) fails loudly
  * with a diff instead of shipping unnoticed.
  *
  * Goldens live in src/test/resources/golden-plans/<name>.txt as the
  * NORMALIZED formatted-explain text (expression ids, plan ids, and file
  * paths are run-dependent and scrubbed; everything structural — node
  * tree, join strategies, pushed filters, read schemas, partial/final agg
  * modes, codegen spans — is kept verbatim).
  *
  * On an INTENDED plan change, regenerate and review the diff like code:
  *   GRAFT_REGEN_GOLDEN_PLANS=1 sbt "testOnly graft.GoldenPlanSpec"
  *
  * Only lazily-built queries belong here: the eager dedup-family entries
  * materialize (checkpoint) during construction, so their "plan" is a
  * truncated lineage stub with nothing structural to pin — their dataflow
  * shapes are asserted op-by-op in PlanSpec via the *Lazy twins instead.
  */
class GoldenPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val goldenDir = new File("src/test/resources/golden-plans")
  private val regen = sys.env.contains("GRAFT_REGEN_GOLDEN_PLANS")

  /** Scrub run-dependent tokens; keep structure. */
  private def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+", "#N")                  // expression ids
      .replaceAll("plan_id=\\d+", "plan_id=N")
      .replaceAll("\\[id=N?#?\\d*\\]", "[id=N]")  // exchange/codegen ids
      .replaceAll("file:[^\\s\\],)]*", "PATH")    // absolute locations
      .replaceAll("\\[\\d+ paths\\]", "[N paths]")
      .replaceAll("\\(\\d+ paths\\)", "(N paths)")
      // JVM lambda identities (typed Dataset ops print the closure
      // object): class-load-order- and run-dependent
      .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-fA-F]+@[0-9a-fA-F]+",
        "\\$\\$Lambda\\$N")
      // Catalyst higher-order-function variable names (x_N, y_N, ...)
      // draw from a session-global counter (x_7 vs x_8 depending on how
      // many lambdas the session has ever analyzed) — suite ordering
      // must not matter
      .replaceAll("\\b([a-z])_\\d+\\b", "$1_N")
      .linesIterator.map(_.stripTrailing()).mkString("\n").trim + "\n"

  private def planOf(df: DataFrame): String =
    normalize(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

  private val headline: Seq[(String, () => DataFrame)] = Seq(
    "q1_agg" -> (() => StarOps.q1Agg(spark, dir)),
    "q3_join" -> (() => StarOps.q3Join(spark, dir)),
    "q5_region" -> (() => StarOps.q5Region(spark, dir)),
    "q9_profit" -> (() => StarOps.q9ProfitNationYear(spark, dir)),
    "q21_waiting" -> (() => ExtraOps.q21WaitingSupplier(spark, dir)),
    "topk_orders" -> (() => StarOps.topkOrders(spark, dir)),
    "lateral_topn" -> (() => ExtraOps.lateralTopN(spark, dir)),
    "asof_join_native" -> (() => ExtraOps.asofErrorSignupNative(spark, dir)),
    "text_tfidf" -> (() => TextOps.textTfidf(spark, dir)),
    "sim_knn" -> (() => SimilarityOps.knnBruteForce(spark, dir)),
    // mining family via the *Lazy twins (identical parameterized builders,
    // no lineage-truncating checkpoint) — exactly the plans a refactor can
    // silently pessimize: candidate-bounded joins, df caps, block shapes
    "dedup_ngram_jaccard" -> (() => TextOps.dedupNgramJaccardLazy(spark, dir)),
    "dedup_containment" -> (() => TextOps.dedupContainmentLazy(spark, dir)),
    "dedup_cdc_chunks" -> (() => TextOps.dedupCdcChunksLazy(spark, dir)),
    "mm_near_dup" ->
      (() => graft.operators.Multimodal.perceptualNearDupLazy(spark, dir)),
    "dedup_incremental" -> (() => {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      TextOps.dedupIncrementalOf(
        docs.filter(col("doc_id") >= TextOps.DefaultIncrementalSplitId),
        docs.filter(col("doc_id") < TextOps.DefaultIncrementalSplitId))
    }),
    // all four exact cosine shapes: the shipped op picks one from
    // measured stats, so each shape needs its own pinned plan
    "text_cosine_pairs_plain" ->
      (() => TextOps.textCosinePairsLazy(spark, dir, strategy = "plain")),
    "text_cosine_pairs_salted" ->
      (() => TextOps.textCosinePairsLazy(spark, dir, strategy = "salted")),
    "text_cosine_pairs_prefix" ->
      (() => TextOps.textCosinePairsLazy(spark, dir, strategy = "prefix")),
    "text_cosine_pairs_kernel" ->
      (() => TextOps.textCosinePairsLazy(spark, dir, strategy = "kernel")))

  headline.foreach { case (name, build) =>
    test(s"golden plan: $name") {
      val actual = planOf(build())
      val golden = new File(goldenDir, s"$name.txt")
      if (regen) {
        goldenDir.mkdirs()
        Files.write(golden.toPath, actual.getBytes(StandardCharsets.UTF_8))
        info(s"regenerated ${golden.getPath}")
      } else {
        assert(golden.exists,
          s"golden plan missing for $name — run " +
            "GRAFT_REGEN_GOLDEN_PLANS=1 sbt 'testOnly graft.GoldenPlanSpec'")
        val expected = new String(
          Files.readAllBytes(golden.toPath), StandardCharsets.UTF_8)
        if (actual != expected) {
          // surface the first diverging line for a readable failure
          val (a, e) = (actual.linesIterator.toSeq, expected.linesIterator.toSeq)
          val firstDiff = a.zipAll(e, "<missing>", "<missing>")
            .indexWhere { case (x, y) => x != y }
          fail(s"plan for $name diverged from golden at line ${firstDiff + 1}:\n" +
            s"  golden: ${e.lift(firstDiff).getOrElse("<missing>")}\n" +
            s"  actual: ${a.lift(firstDiff).getOrElse("<missing>")}\n" +
            "If intended, regenerate with GRAFT_REGEN_GOLDEN_PLANS=1 and " +
            "review the diff.\nFull actual plan:\n" + actual)
        }
      }
    }
  }
}
