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
  * Two internal count strategies, chosen per evaluation from the actual
  * sizes (both exact; only count survivors pay the sorted-merge dot
  * product):
  * - BITSET-AND (dense vocab: words ≤ 4·avg terms/doc): each doc's term
  *   set becomes a V-bit set; `shared` is a popcount over the AND —
  *   O(V/64) ≈ 15 longs on a 931-term vocab.
  * - PROBE (wide vocab): the same V-bit sets index membership, but each
  *   pair probes only the SHORTER side's terms — O(min(|a|, |b|))
  *   branchless loads, independent of vocab width. Replaced the round-9
  *   two-pointer count-merge (O(|a| + |b|) branchy steps), whose 1.25 B
  *   walks were the measured ~30 s sf1 floor.
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

  /** Sorted-merge dot product — paid only by count survivors (~0.07 %
    * of pairs at sf1), so the branchy two-pointer walk is off the hot
    * path (the round-9 kernel ran it per PAIR as the count strategy and
    * it was the measured ~30 s sf1 floor; counting now goes through
    * [[probeShared]] in the wide-vocab regime). Folds in ascending-id
    * order (deterministic). */
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

  /** `shared` via membership probes of `ts` against a V-bit set —
    * O(|ts|) branchless dependent loads (the other side's ~V/8-byte
    * bitset is L1-resident), vs O(V/64) for the AND+popcount scan and
    * O(|a| + |b|) branchy steps for the two-pointer merge. This is the
    * wide-vocab regime's winner (round-10: ScaleGen's 25.7 k-term sf1
    * vocab defeats the bitset-scan crossover and the count-merge walk
    * was the measured ~30 s floor — SURVEY §8's "next lever"): the probe
    * touches only the SHORTER side's terms, never the vocab width. */
  private def probeShared(ts: Array[Int], bits: Array[Long],
      off: Int): Int = {
    var s = 0
    var k = 0
    while (k < ts.length) {
      val t = ts(k)
      s += ((bits(off + (t >>> 6)) >>> (t & 63)) & 1L).toInt
      k += 1
    }
    s
  }

  def run(aArr: ArrayData, bArr: ArrayData, diag: Boolean, minS: Int,
      vocab: Int): GenericArrayData = {
    val a = new Side(aArr)
    val b = if (diag) a else new Side(bArr)
    val words = (vocab + 63) >>> 6
    // Count-strategy selection, cheapest first (all three are EXACT —
    // emitted pairs are bit-identical across strategies, pinned by
    // CosineBlockPairsExprSpec):
    //  - bitset AND+popcount when the vocab is narrow enough that the
    //    V/64-word scan beats per-term work (4× headroom measured:
    //    popcount ops are ~branchless, merge steps branch);
    //  - membership PROBE otherwise: bitsets still index membership, but
    //    each pair costs only the shorter side's |terms| dependent loads
    //    — the wide-vocab regime where the round-9 kernel fell back to
    //    the two-pointer count-merge and paid ~30 s at sf1.
    // The merge walk survives only in mergeDot, which gate survivors
    // (~0.07 % of pairs at sf1) alone pay.
    val avgTerms =
      if (a.n + b.n == 0) 0L
      else (a.totalTerms + b.totalTerms) / math.max(a.n + b.n, 1)
    val useBits = words <= 4 * math.max(avgTerms, 1)
    val aBits = a.bitsets(words)
    val bBits = if (diag) aBits else b.bitsets(words)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < a.n) {
      val ta = a.terms(i)
      val oa = i * words
      var j = if (diag) i + 1 else 0
      while (j < b.n) {
        val shared =
          if (useBits) {
            var s = 0
            val ob = j * words
            var k = 0
            while (k < words) {
              s += java.lang.Long.bitCount(aBits(oa + k) & bBits(ob + k))
              k += 1
            }
            s
          } else {
            val tb = b.terms(j)
            if (ta.length <= tb.length) probeShared(ta, bBits, j * words)
            else probeShared(tb, aBits, oa)
          }
        if (shared >= minS) {
          val dot = mergeDot(ta, a.ws(i), b.terms(j), b.ws(j))
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
