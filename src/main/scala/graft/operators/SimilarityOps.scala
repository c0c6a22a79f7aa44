package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding
  * array<float>, label) — approximate-nearest-neighbor building blocks for
  * a training-data pipeline.
  *
  * Baseline: brute-force cosine top-k (exact, broadcast the small query
  * side, scan the corpus once — at 100 TB this is the "re-rank" stage).
  * Scale path: sign-random-projection LSH bucketing (Charikar '02) that
  * prunes the corpus to matching buckets before exact re-ranking.
  *
  * All arithmetic is double, folded in index order, so the DuckDB oracle
  * (same fold order) produces bit-identical values before rounding.
  */
object SimilarityOps {

  import EventOps.tbl

  /** Σ aᵢ·bᵢ over two float arrays, computed in double, in index order —
    * the native codegen kernel (DotProductExpr). */
  def dot(a: Column, b: Column): Column =
    graft.functions.NativeFunctions.dot_ff(a, b)

  /** Lambda-expression twin of [[dot]] — kept for kernel cross-validation. */
  def dotLambda(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact cosine top-k: queries = vec_id < 10 (broadcast),
    * corpus scanned once; per-query top-5 via window with deterministic
    * tie-break.
    *
    * Norms are computed ONCE per vector (projected before the join) rather
    * than per pair — same values (identical per-vector fold), 3× fewer
    * folds. At 100 TB: normalize-and-store at ingest, making the scan a
    * single fused dot product per pair. */
  def knnBruteForce(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim",
        dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for SRP-LSH:
    * unit-free integer weights derived from (plane, dim) by a splitmix-like
    * mix — reproducible across engines and runs with no RNG object. */
  private def planeWeight(plane: Int, dim: Column): Column = {
    // reduce mod p before multiplying so the product stays well under 2^63
    val x = ((dim + lit(plane * 1315423911L)) % lit(1000003L)) *
      lit(2654435761L) % lit(1000003L)
    (x % lit(2001L)) - lit(1000L) // pseudo-uniform in [-1000, 1000]
  }

  /** Sign-random-projection bucket id (nBits hyperplanes → integer bucket). */
  def srpBucket(emb: Column, nBits: Int): Column =
    (0 until nBits).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast("double") * planeWeight(p, i).cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN: hash corpus + queries to SRP buckets, search only
    * same-bucket candidates, exact cosine re-rank. Approximate (recall <1),
    * so no SQL oracle — spec-verified against knnBruteForce instead. */
  def knnLsh(spark: SparkSession, dir: String, k: Int = 5,
      nBits: Int = 8): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
      .withColumn("bucket", srpBucket(col("embedding"), nBits))
      .withColumn("nrm", norm(col("embedding")))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket"), col("nrm").as("q_nrm"))
    val scored = emb.join(broadcast(queries),
        emb("bucket") === queries("bucket") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim",
        dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF-style ANN: deterministic coarse quantizer (the first nCentroids
    * vectors serve as centroids — a production system would k-means these),
    * corpus assigned to its nearest cell, queries probe the nProbe nearest
    * cells, exact cosine re-rank inside the probed cells.
    *
    * Scale path: the assignment pass is one broadcast join over the corpus;
    * the search touches ~nProbe/nCentroids of the data. Approximate, so no
    * SQL oracle — spec-verified per-pair against the exact cosine. */
  def knnIvf(spark: SparkSession, dir: String, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val cents = emb.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("cent_id"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("c_sim",
        dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .withColumn("crn", row_number().over(wAssign))
    val cells = assigned.filter(col("crn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"),
        col("nrm"))
    val probes = assigned.filter(col("vec_id") < 10 && col("crn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cent_id").as("cell"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
      .join(probes, "q_id")
    val scored = cells.join(broadcast(queries),
        cells("cell") === queries("cell") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim",
        dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), round(col("cos_sim"), 6).as("cos_sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold — exact
    * all-pairs formulation with a block-join guard (same label block) to
    * bound the quadratic term; oracle-matched. */
  def embeddingNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.9): DataFrame = {
    val emb = tbl(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding"), col("label"),
      norm(col("embedding")).as("nrm")) // once per vector, not per pair
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim",
        dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }
}
