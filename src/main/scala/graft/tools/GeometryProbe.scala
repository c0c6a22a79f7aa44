package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness for choosing the MinHash-LSH band
  * geometry (round-10 VERDICT item 2): for each candidate (bands, rows)
  * layout, counts the banded candidate pairs (the cost driver — the
  * quantity that grew 63× at 10× data under the round-9 2×2 layout) and
  * the TRUE pairs missed (recall vs the exact n-gram Jaccard miner).
  * Prints one JSON line per geometry; decision = smallest candidate set
  * with zero misses at both sf0.1 and the sf1 rehearsal scale.
  *
  * Usage: runMain graft.tools.GeometryProbe <dir> [maxHashes=24]
  */
object GeometryProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val maxHashes = if (args.length > 1) args(1).toInt else 24
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel

    // maxHashes MinHash values per doc over the library's weakHash base
    // (universal-hash params follow TextOps.minhashParams' extension rule)
    val params = TextOps.minhashParamsN(maxHashes)
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("s"))
      .withColumn("hv", TextOps.weakHash(col("s")))
    val mhCols = params.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("hv") + lit(b)) % TextOps.MOD).as(s"mh$i")
    }
    val sigs = sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
      .persist(StorageLevel.MEMORY_ONLY)
    sigs.count()
    val truePairs = TextOps.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").persist(StorageLevel.MEMORY_ONLY)
    val nTrue = truePairs.count()

    val geometries = Seq((2, 2), (3, 3), (5, 3), (4, 4), (6, 4), (4, 5))
    geometries.foreach { case (bands, rows) =>
      require(bands * rows <= maxHashes)
      val bucketCols = (0 until bands).map { b =>
        val cs = (0 until rows).map(r => col(s"mh${b * rows + r}"))
        concat(lit(s"$b|"), concat_ws("_", cs: _*))
      }
      val buckets = sigs.select(col("doc_id"),
        explode(array(bucketCols: _*)).as("bucket"))
      val cand = buckets.as("a").join(buckets.as("b"),
          col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().persist(StorageLevel.MEMORY_ONLY)
      val nCand = cand.count()
      val missed = truePairs.join(cand, Seq("doc_a", "doc_b"), "left_anti")
        .count()
      cand.unpersist(true)
      println(s"""{"dir":"$dir","bands":$bands,"rows":$rows,""" +
        s""""candidates":$nCand,"true_pairs":$nTrue,"missed":$missed}""")
    }
    spark.stop()
  }
}
