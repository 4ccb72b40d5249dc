package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distinct-count sketches for cardinality at 100 TB.
  *
  * Exact `COUNT(DISTINCT key)` shuffles every distinct key to its
  * group's reducer — at corpus scale (billions of URLs, shingles,
  * tokens) the shuffle IS the cost. The K-minimum-values (KMV) sketch
  * [Bar-Yossef et al. 2002; Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07] bounds the
  * per-group state to the k smallest distinct hash values: uniform
  * hashes split [0,1) into ~n equal gaps, so the k-th smallest value
  * u_k estimates k/n and `(k-1)/u_k` is the unbiased cardinality
  * estimate. Relative error ~ 1/sqrt(k-2) (k=64 → ~13%).
  *
  * KMV first: "k smallest distinct values of a set" is ORDER-FREE and
  * engine-portable — built on the shared
  * [[graft.text.TextOps.h60]] portable hash, any ANSI engine reproduces
  * the estimate bit-for-bit with a window query (the DuckDB oracle
  * twin). [[HllSketchAgg]] below gets the same portability for
  * HyperLogLog by rebuilding registers relationally. Same estimator
  * family the reference exposes through its sketch module; here it is
  * a Spark `Aggregator` with map-side partial combine: each partition
  * keeps its own k-bounded sorted array and partials merge in O(k), so
  * the shuffle carries k longs per group instead of n keys.
  *
  * The sketch is also a synopsis under set operations (SIGMOD'07):
  * [[KmvSketch.union]] of two sketches equals the sketch of the union
  * exactly, and [[KmvSketch.jaccard]]/[[KmvSketch.intersectionEstimate]]
  * estimate overlap from the combined k-min set — distinct counts,
  * overlap and containment for free at the cost of one pass per table.
  */
object Sketches {

  /** 2^60 as an exact double — h60 values are uniform in [0, 2^60). */
  val TwoPow60: Double = 1.152921504606846976e18

  /** Cardinality estimate from a k-bounded sorted distinct-hash array:
    * exact size when the set never filled (the sketch saw every
    * distinct value), else (k-1) * 2^60 / h_(k). Written so the DuckDB
    * twin can repeat the arithmetic: one int→double conversion per
    * operand, one multiply, one divide — IEEE round-to-nearest makes
    * both engines produce the same bits. */
  def estimate(mins: Array[Long], k: Int): Double =
    if (mins.length < k) mins.length.toDouble
    else (k - 1).toDouble * TwoPow60 / mins(k - 1).toDouble

  /** KMV distinct sketch over pre-hashed h60 values.
    *
    * Buffer = sorted array of at most k DISTINCT hashes (KMV needs set
    * semantics: a duplicate hash is the same value seen again and must
    * not occupy a slot). Insertion keeps the array sorted (binary
    * search + memmove, k is small); merge is a sorted-merge keeping the
    * k smallest distinct — both order-free, so the result is identical
    * for any row order or partition split (AggregatorLawsSpec).
    */
  class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(b: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(b, h)
      if (pos >= 0) return b // already present
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) { // h < current max: max falls out
        System.arraycopy(b, ins, b, ins + 1, k - ins - 1)
        b(ins) = h
        b
      } else b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (i < a.length && a(i) == v) i += 1 // cross-array duplicate
        if (j < b.length && b(j) == v) j += 1
        out(o) = v
        o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    def finish(b: Array[Long]): Double = estimate(b, k)
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** [[KmvDistinct]] as an untyped aggregate column over an h60 hash. */
  def kmvDistinct(hash: Column, k: Int): Column =
    udaf(new KmvDistinct(k), Encoders.scalaLong)(hash)

  /** Raw-sketch variant (the k-min array itself, for set operations /
    * persistence beside a layer like the histogram sidecars). */
  class KmvSketchAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inner = new KmvDistinct(k)
    def zero: Array[Long] = inner.zero
    def reduce(b: Array[Long], h: Long): Array[Long] = inner.reduce(b, h)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  def kmvSketch(hash: Column, k: Int): Column =
    udaf(new KmvSketchAgg(k), Encoders.scalaLong)(hash)

  /** Count-Min frequency sketch [Cormode & Muthukrishnan 2005]: d rows
    * of w counters; item x increments cell (r, h_r(x)) in every row and
    * its frequency estimate is the min over rows — always >= the true
    * count, over by at most ~2N/w with probability 1-(1/2)^d. The
    * entire matrix is one mergeable buffer (d*w longs, elementwise-sum
    * merge — order-free), so token frequencies over 100 TB reduce to
    * one fixed-size row per partition instead of a vocabulary-sized
    * shuffle. Row hashes come from the portable h60 over "r:item", so
    * an ANSI engine reproduces the matrix — and hence the estimates —
    * exactly (the t_cms_heavy oracle). */
  class CountMin(d: Int, w: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], item: String): Array[Long] = {
      var r = 0
      while (r < d) {
        b(r * w + (graft.text.TextOps.hash60(s"$r:$item") % w).toInt) += 1L
        r += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  def countMin(item: Column, d: Int, w: Int): Column =
    udaf(new CountMin(d, w), Encoders.STRING)(item)

  /** Point estimate from a materialized CMS matrix. */
  def cmsEstimate(matrix: IndexedSeq[Long], d: Int, w: Int, item: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = matrix(r * w + (graft.text.TextOps.hash60(s"$r:$item") % w).toInt)
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Driver-side set operations on materialized sketches. */
  object KmvSketch {

    /** Sketch of A ∪ B — EXACTLY the sketch that would be built from
      * the concatenated inputs (merge is the aggregator's own). */
    def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
      new KmvDistinct(k).merge(a.clone(), b)

    /** Jaccard estimate: fraction of the union's k-min set present in
      * both input sketches (the SIGMOD'07 ρ/k rule). */
    def jaccard(a: Array[Long], b: Array[Long], k: Int): Double = {
      val u = union(a, b, k)
      if (u.isEmpty) return 0.0
      val both = u.count(h =>
        java.util.Arrays.binarySearch(a, h) >= 0 &&
          java.util.Arrays.binarySearch(b, h) >= 0)
      both.toDouble / u.length.toDouble
    }

    /** |A ∩ B| estimate = Jaccard * |A ∪ B| estimate. */
    def intersectionEstimate(a: Array[Long], b: Array[Long], k: Int): Double =
      jaccard(a, b, k) * estimate(union(a, b, k), k)
  }

  // -------------------------------------------------------------------
  // HyperLogLog
  // -------------------------------------------------------------------

  /** HyperLogLog registers [Flajolet, Fusy, Gandouet, Meunier 2007]
    * over h60 hashes — the constant-memory companion to KMV: m = 2^p
    * registers of one byte each regardless of cardinality (KMV stores k
    * longs), mergeable by element-wise max, estimate within ~1.04/√m.
    *
    * Made engine-portable the same way the KMV gate is: register index
    * = top p hash bits, rho = leading-zero count of the remaining
    * (60-p)-bit field + 1 — pure INTEGER functions of the shared
    * portable hash — and "max rho per register" is order-free, so a
    * relational twin rebuilds every register exactly. The harmonic-mean
    * denominator Σ 2^(-M_j) scaled by 2^(60-p+1) is an exact BIGINT sum
    * (each term a power of two, total < 2^62 for p ≥ 8), and the raw
    * estimate α_m·m²/denom is a single rounding of exact operands, so
    * the estimate itself hash-matches across engines (a_hll_distinct).
    *
    * Buffer is Array[Int] (not Array[Byte]: Spark encodes byte arrays
    * as BinaryType, which the gate's `aggregate` HOF can't fold over;
    * 2^p ints of partial state per group is still tiny and map-side
    * combined). */
  class HllSketchAgg(p: Int) extends Aggregator[Long, Array[Int], Seq[Int]] {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    private val m = 1 << p
    private val wBits = 60 - p

    def zero: Array[Int] = new Array[Int](m)

    def reduce(b: Array[Int], h: Long): Array[Int] = {
      val idx = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      // leading zeros within the wBits-wide field, +1; w = 0 → wBits + 1
      val rho = java.lang.Long.numberOfLeadingZeros(w) - (64 - wBits) + 1
      if (rho > b(idx)) b(idx) = rho
      b
    }

    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    def finish(b: Array[Int]): Seq[Int] = b.toSeq
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
  }

  /** HLL register column over pre-hashed h60 values. */
  def hllSketch(hash: Column, p: Int): Column =
    udaf(new HllSketchAgg(p)).apply(hash)

  /** Library-side estimate with the standard small-range correction
    * (linear counting when raw ≤ 2.5m and empty registers remain).
    * The correction takes a transcendental log, so it is NOT the
    * bitwise-portable gate path — the gate emits the raw estimate plus
    * the exact integer register summaries instead. */
  def hllEstimate(regs: Seq[Int], p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var denom = 0.0
    var zeros = 0
    regs.foreach { r => denom += math.pow(2.0, -r.toDouble); if (r == 0) zeros += 1 }
    val raw = alpha * m * m / denom
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Union = element-wise max (lossless: HLL(A ∪ B) exactly). */
  def hllUnion(a: Seq[Int], b: Seq[Int]): Seq[Int] =
    a.lazyZip(b).map(math.max)
}
