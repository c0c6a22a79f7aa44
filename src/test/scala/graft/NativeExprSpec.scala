package graft

import graft.functions.NativeFunctions
import graft.operators.{SimilarityOps, TextOps}
import org.apache.spark.sql.functions._

/** Native codegen kernels must be value-IDENTICAL to their interpreted
  * lambda twins (the oracle SQL mirrors the lambda formulation). */
class NativeExprSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("weak_hash kernel == lambda formulation on all corpus tokens") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
    val diff = toks
      .select(NativeFunctions.weak_hash(col("t")).as("k"),
        TextOps.weakHashLambda(col("t")).as("l"))
      .filter(col("k") =!= col("l")).count()
    assert(diff === 0)
  }

  test("weak_hash edge cases: empty, single char, unicode-free parity") {
    import spark.implicits._
    val rows = Seq("", "a", "ab", " ", "123", "zz top").toDF("t")
      .select(col("t"), NativeFunctions.weak_hash(col("t")).as("k"),
        TextOps.weakHashLambda(col("t")).as("l"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2), r.getString(0)))
  }

  test("dot kernel == lambda fold on all embedding pairs (bit-identical)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(50)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
    val diff = pairs.select(
        NativeFunctions.dot_ff(col("a.embedding"), col("b.embedding")).as("k"),
        SimilarityOps.dotLambda(col("a.embedding"), col("b.embedding")).as("l"))
      .filter(col("k") =!= col("l")).count() // exact double equality
    assert(diff === 0)
  }

  test("shingles kernel == HOF chain on the whole corpus") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val diff = docs.select(
        TextOps.shingles(col("text")).as("k"),
        TextOps.shinglesLambda(col("text")).as("l"))
      .filter(col("k") =!= col("l")).count()
    assert(diff === 0)
    // edge cases: <3 words, exactly 3 words, duplicate shingles
    import spark.implicits._
    val edges = Seq("a b", "a b c", "x y x y x y x y").toDF("text")
      .select(TextOps.shingles(col("text")).as("k"),
        TextOps.shinglesLambda(col("text")).as("l"))
      .collect()
    edges.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("SQL registration: graft_weak_hash and graft_dot usable from spark.sql") {
    graft.functions.NativeFunctions.register(spark)
    val r = spark.sql("SELECT graft_weak_hash('abc') AS h").collect().head.getLong(0)
    val expected = 7L * 3 + 31L * 'a' + 17L * 'c' + ('a' + 'b' + 'c')
    assert(r === expected)
    spark.read.parquet(s"$dir/embeddings.parquet").limit(2)
      .createOrReplaceTempView("emb2")
    val d = spark.sql(
      "SELECT graft_dot(a.embedding, b.embedding) AS d FROM emb2 a, emb2 b " +
        "WHERE a.vec_id < b.vec_id").collect()
    assert(d.nonEmpty && !d.head.isNullAt(0))
  }

  test("kernel stays inside whole-stage codegen (no fallback)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val df = e.select(NativeFunctions.dot_ff(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd nodes print with the "*(stageId)" prefix; the Project
    // containing the kernel must carry it (CodegenFallback would drop it)
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("dotproductexpr")), plan)
  }
}
