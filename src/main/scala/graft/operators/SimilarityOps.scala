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

  /** Pure-Scala twin of [[planeWeight]] — lets the DuckDB oracle (and
    * specs) replay the exact hyperplanes as literal weight vectors. */
  def planeWeightScala(plane: Int, dim: Int): Long = {
    val x = ((dim + plane * 1315423911L) % 1000003L) * 2654435761L % 1000003L
    (x % 2001L) - 1000L
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
    // the query side's bucket is aliased: both buckets derive from the same
    // expression tree, and unaliased Column equality on a shared derived
    // column logs a misleading "trivially true equals predicate" warning
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"), col("nrm").as("q_nrm"))
    val scored = emb.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
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
    * Scale path: the centroid set is a small CONSTANT (nCentroids), so it is
    * collected once and inlined as a literal array; every corpus row computes
    * its nearest cell as a per-row argmax expression — map-only, zero
    * shuffle. (The previous formulation crossJoined the corpus ×nCentroids
    * and ran a row_number window over the amplified relation, i.e. a full
    * corpus shuffle just to pick each vector's cell.) The search then touches
    * ~nProbe/nCentroids of the data. Approximate, so no SQL oracle —
    * spec-verified per-pair against the exact cosine. */
  def knnIvf(spark: SparkSession, dir: String, k: Int = 5,
      nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    val emb = tbl(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    // driver-side collect is bounded by the constant nCentroids (16 rows);
    // norms are folded exactly like Kernels.dotFF (index order, double acc)
    val cents: Array[(Long, Seq[Float], Double)] =
      tbl(spark, dir, "embeddings")
        .filter(col("vec_id") < nCentroids)
        .select(col("vec_id"), col("embedding"))
        .collect()
        .map { r =>
          val e: Seq[Float] = r.getSeq[Float](1)
          var s = 0.0
          e.foreach(f => s += f.toDouble * f.toDouble)
          (r.getLong(0), e, math.sqrt(s))
        }.sortBy(_._1)
    val centArr = array(cents.map { case (id, e, cn) =>
      struct(lit(id).as("cent_id"), typedlit(e).as("c_emb"), lit(cn).as("c_nrm"))
    }: _*)
    // per-row cosine to every centroid, evaluated in cent_id order
    def centSims(e: Column, n: Column): Column =
      transform(centArr, c => struct(
        (dot(e, c.getField("c_emb")) / (n * c.getField("c_nrm"))).as("sim"),
        c.getField("cent_id").as("cent_id")))
    // argmax: strictly-greater keeps the earliest (lowest cent_id) on ties —
    // identical tie-break to a (sim desc, cent_id asc) rank-1 window
    def nearestCell(e: Column, n: Column): Column =
      aggregate(centSims(e, n),
        struct(lit(Double.NegativeInfinity).as("sim"), lit(-1L).as("cent_id")),
        (acc, s) => when(s.getField("sim") > acc.getField("sim"), s)
          .otherwise(acc))
        .getField("cent_id")
    val cells = emb
      .select(col("vec_id"), nearestCell(col("embedding"), col("nrm")).as("cell"),
        col("embedding"), col("nrm"))
    // queries probe their nProbe nearest cells: sort the tiny sims array
    // (sim desc, cent_id asc) and explode the head
    val bySimDesc = (l: Column, r: Column) =>
      when(l.getField("sim") > r.getField("sim"), lit(-1))
        .when(l.getField("sim") < r.getField("sim"), lit(1))
        .when(l.getField("cent_id") < r.getField("cent_id"), lit(-1))
        .otherwise(lit(1))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"),
        explode(transform(
          slice(array_sort(centSims(col("embedding"), col("nrm")), bySimDesc),
            1, nProbe),
          c => c.getField("cent_id"))).as("cell"))
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

  /** Ingest-time unit-normalization — the precompute the kNN scan stage
    * assumes ("normalize-and-store at ingest" in knnBruteForce's doc):
    * divide every component by the vector's L2 norm so cosine becomes a
    * single fused dot product per pair. Map-only; emitted exploded as
    * (vec_id, dim, unit_val) rows with 6-dp rounding for cross-engine
    * exactness. */
  def normalizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val nrm = norm(col("embedding"))
    tbl(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        transform(col("embedding"), x => round(x.cast("double") / nrm, 6))))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        col("col").as("unit_val"))
  }

  /** Int8 scalar quantization — the storage/bandwidth path for ANN at
    * scale: each vector is mapped to bytes `round(x·127/max|x|)` plus one
    * per-vector `scale = max|x|/127` for dequantization, cutting an
    * fp32 corpus 4× (the difference between an index that fits executor
    * memory and one that doesn't at 100 TB). Map-only — no shuffle.
    * Determinism: components are rounded via `floor(v + 0.5)` written
    * identically here and in the oracle (IEEE double ops are exact
    * cross-engine); an all-zero vector quantizes to zeros with scale 0. */
  def quantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val emb = transform(col("embedding"), x => x.cast("double"))
    val maxabs = array_max(transform(emb, x => abs(x)))
    tbl(spark, dir, "embeddings")
      .select(col("vec_id"),
        when(maxabs === 0.0, transform(emb, _ => lit(0L)))
          .otherwise(transform(emb,
            x => floor(x * 127.0 / maxabs + 0.5).cast("long"))).as("qvec"),
        (maxabs / 127.0).as("scale"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold: candidates
    * are generated by SRP-LSH bucketing WITHIN each label block (reusing
    * [[srpBucket]] — deterministic hyperplanes, so the DuckDB oracle can
    * replay the exact same buckets), then verified with the exact cosine.
    *
    * Scale: the join key is (label, bucket) — 2^nBits buckets per label —
    * so one hot label never forms a quadratic all-pairs block (the previous
    * label-only formulation was a cartesian bomb on skewed labels: one
    * label holding 1% of a 100 TB corpus squares to ~10^16 pairs). The cost
    * is recall: a qualifying pair in different buckets is not emitted.
    * Recall is 1.0 for exact duplicates (identical vectors always share a
    * bucket — the primary dedup case) and (1 − θ/π)^nBits for angle θ
    * pairs (Charikar '02), ~69% at cos 0.99 with the default 8 bits; raise
    * recall by OR-ing multiple bucket tables (band trick) at proportional
    * cost. Emitted pairs carry their EXACT cosine — precision 1.0. */
  def embeddingNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.9, nBits: Int = 8): DataFrame = {
    val emb = tbl(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding"), col("label"),
      norm(col("embedding")).as("nrm"), // once per vector, not per pair
      srpBucket(col("embedding"), nBits).as("bucket"))
    emb.as("a").join(emb.as("b"),
        col("a.label") === col("b.label") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim",
        dot(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }
}
