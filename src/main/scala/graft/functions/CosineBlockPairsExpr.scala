package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Block-pair kernel for the EXACT cosine pair miner (the dense-corpus
  * strategy of `TextOps.textCosinePairs`).
  *
  * Motivation, measured on the r8 sf1 rehearsal: the inverted-index
  * formulation shuffles Σdf² expansion rows into the pair aggregation
  * (3.1 B rows / ~120 GB at sf1 → 768.5 s), and on a DENSE corpus no
  * candidate filter can help — 82 % of ALL doc pairs share ≥ 1 surviving
  * term at sf0.1, and 2.4 % of ALL pairs qualify outright, so the output
  * itself is Θ(n²) and candidate generation is not the bottleneck, the
  * pair-keyed exchange is. This kernel removes that exchange entirely:
  * docs are collected into ⌈n/B⌉-sized blocks, the B(B+1)/2 block pairs
  * are enumerated by a tiny self-join, and ALL per-pair work happens
  * inside this expression — one evaluation per block pair, emitting only
  * qualifying pairs. Shuffled bytes drop from Σdf²·rowWidth to
  * B·(corpus index bytes): the replication factor is B, the unavoidable
  * cost of meeting every other block once.
  *
  * Inputs: two arrays of doc structs `(doc_id long, terms array<int>,
  * ws array<double>, nrm double)` — `terms` sorted ascending (dense
  * global ids), `ws` aligned tf·idf weights, `nrm` the doc's L2 norm —
  * plus `sameBlock` (the diagonal flag), `minShared`, and the dense
  * vocabulary size. Output: `array<struct<doc_a, doc_b, shared,
  * cos_sim>>` for pairs with ≥ `minShared` shared terms, `cos_sim`
  * rounded half-up to 6 dp exactly like `round(col, 6)`.
  *
  * Exactly-once: the caller joins blocks on `x.blk <= y.blk`, so an
  * unordered pair {a, b} meets in precisely one evaluation — the diagonal
  * (sameBlock) iterates positions i < j, the off-diagonal the full
  * A × B cross; `doc_a`/`doc_b` are canonicalized min/max afterwards.
  *
  * Two internal strategies, chosen per evaluation from the actual sizes:
  * - BITSET (dense vocab: words ≤ 4·avg terms/doc): each doc's term set
  *   becomes a V-bit set; the `shared` gate is a popcount over the AND —
  *   O(V/64) ≈ 15 longs on a 931-term vocab — and only gate survivors
  *   pay the sorted-merge dot product.
  * - MERGE (sparse: bitset words would exceed the merge cost): one
  *   two-pointer pass over the sorted term ids computes shared and dotp
  *   together, O(|a| + |b|) per pair.
  *
  * CodegenFallback is deliberate and does NOT put interpretation in the
  * hot path: the expression is evaluated once per BLOCK PAIR (hundreds of
  * rows), and each evaluation runs a tight primitive-array loop over
  * millions of doc pairs — the per-call dispatch overhead is amortized
  * ~10⁶×, the opposite regime from the per-row scalar kernels in
  * [[NativeExpressions]] (which do need `doGenCode`). */
case class CosineBlockPairsExpr(docsA: Expression, docsB: Expression,
    sameBlock: Expression, minShared: Expression, vocab: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(docsA, docsB, sameBlock, minShared, vocab)
  override def nullable: Boolean = false
  override def dataType: DataType = CosineBlockPairsExpr.outType

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4))

  override def eval(input: InternalRow): Any = {
    val a = docsA.eval(input).asInstanceOf[ArrayData]
    val b = docsB.eval(input).asInstanceOf[ArrayData]
    val diag = sameBlock.eval(input).asInstanceOf[Boolean]
    val minS = minShared.eval(input).asInstanceOf[Int]
    val v = vocab.eval(input).asInstanceOf[Int]
    CosineBlockPairsExpr.run(a, b, diag, minS, v)
  }
}

object CosineBlockPairsExpr {
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("shared", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)

  /** One block side decoded to primitive arrays — the loop below touches
    * no Catalyst accessors. */
  private final class Side(arr: ArrayData) {
    val n: Int = arr.numElements()
    val ids = new Array[Long](n)
    val terms = new Array[Array[Int]](n)
    val ws = new Array[Array[Double]](n)
    val nrm = new Array[Double](n)
    var totalTerms = 0L
    locally {
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 4)
        ids(i) = row.getLong(0)
        terms(i) = row.getArray(1).toIntArray()
        ws(i) = row.getArray(2).toDoubleArray()
        nrm(i) = row.getDouble(3)
        totalTerms += terms(i).length
        i += 1
      }
    }
    /** V-bit sets, flattened n×words. Built lazily — only in bitset mode. */
    def bitsets(words: Int): Array[Long] = {
      val bits = new Array[Long](n * words)
      var i = 0
      while (i < n) {
        val ts = terms(i)
        val off = i * words
        var k = 0
        while (k < ts.length) {
          val t = ts(k)
          bits(off + (t >>> 6)) |= 1L << (t & 63)
          k += 1
        }
        i += 1
      }
      bits
    }
  }

  /** `round(x, 6)` semantics (HALF_UP on the decimal rendering). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Sorted-merge passes, split so the weight arithmetic runs only for
    * gate survivors (~0.07 % of pairs at sf1) and every per-pair return
    * is a primitive. The measured kernel cost at sf1 IS the count-merge
    * walk itself — 1.25 B two-pointer passes over ~45-term arrays ≈ 30 s
    * across 32 threads (a combined Tuple2[Int, Double] return measured
    * within noise: the tuple is @specialized) — which is the arithmetic
    * floor of merge mode; the bitset mode (dense vocab) gates cheaper
    * but this corpus's scaled vocabulary (25.7 k terms at sf1) makes the
    * per-pair bitset scan wider than the merge. Dot pass folds in
    * ascending-id order (deterministic). */
  private def mergeShared(ta: Array[Int], tb: Array[Int]): Int = {
    var i = 0; var j = 0; var shared = 0
    while (i < ta.length && j < tb.length) {
      val d = ta(i) - tb(j)
      if (d == 0) { shared += 1; i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    shared
  }

  private def mergeDot(ta: Array[Int], wa: Array[Double],
      tb: Array[Int], wb: Array[Double]): Double = {
    var i = 0; var j = 0; var dot = 0.0
    while (i < ta.length && j < tb.length) {
      val d = ta(i) - tb(j)
      if (d == 0) { dot += wa(i) * wb(j); i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    dot
  }

  def run(aArr: ArrayData, bArr: ArrayData, diag: Boolean, minS: Int,
      vocab: Int): GenericArrayData = {
    val a = new Side(aArr)
    val b = if (diag) a else new Side(bArr)
    val words = (vocab + 63) >>> 6
    // bitset pays when the AND+popcount scan beats the two-pointer merge;
    // 4× is the measured crossover headroom (popcount ops are ~branchless,
    // merge steps branch)
    val avgTerms =
      if (a.n + b.n == 0) 0L
      else (a.totalTerms + b.totalTerms) / math.max(a.n + b.n, 1)
    val useBits = words <= 4 * math.max(avgTerms, 1)
    val aBits = if (useBits) a.bitsets(words) else null
    val bBits = if (!useBits) null else if (diag) aBits else b.bitsets(words)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < a.n) {
      var j = if (diag) i + 1 else 0
      while (j < b.n) {
        val shared =
          if (useBits) {
            var s = 0
            val oa = i * words; val ob = j * words
            var k = 0
            while (k < words) {
              s += java.lang.Long.bitCount(aBits(oa + k) & bBits(ob + k))
              k += 1
            }
            s
          } else mergeShared(a.terms(i), b.terms(j))
        if (shared >= minS) {
          val dot = mergeDot(a.terms(i), a.ws(i), b.terms(j), b.ws(j))
          emit(out, a.ids(i), b.ids(j), shared, dot, a.nrm(i) * b.nrm(j))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def emit(out: scala.collection.mutable.ArrayBuffer[InternalRow],
      idA: Long, idB: Long, shared: Int, dot: Double, nn: Double): Unit = {
    val (da, db) = if (idA < idB) (idA, idB) else (idB, idA)
    out += new GenericInternalRow(
      Array[Any](da, db, shared.toLong, round6(dot / nn)))
  }
}
