package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-pruned semi-join — the runtime-filter pattern for big joins.
  *
  * At 100 TB the cost of `fact SEMI JOIN dim` is shuffling the fact
  * side; when the dim side is selective, almost all shuffled fact rows
  * are discarded AFTER the wire. The fix every warehouse engine ships
  * (Spark's own InjectRuntimeFilter, Trino dynamic filtering): build a
  * Bloom filter of the dim keys, broadcast it, and drop non-matching
  * fact rows AT THE SCAN, before the exchange. The final exact join
  * keeps semantics — the Bloom pass may let false positives through
  * (never false negatives), the join removes them, so the result is
  * bitwise the plain semi-join and the oracle is plain SQL.
  *
  * Spark-first shape: the filter bits are a plain `Aggregator` with
  * bit-OR merge (order-free, map-side combinable: each task ORs its own
  * local bitset, the driver merges one bitset per partition); the probe
  * is a native codegen expression over `xxhash64`, so the prefilter
  * stays inside WholeStageCodegen and is eligible for scan pushdown of
  * anything stacked above it. Double hashing (Kirsch–Mitzenmacher) over
  * a power-of-two bit count: probe i tests bit `h1 + i*h2 (mod m)`.
  */
object BloomJoin {

  /** murmur3 finalizer — full-avalanche mix so every output bit depends
    * on every input bit (the input hash may be weak in some bits). */
  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** Probe positions: base from the mixed hash's low half, stride from
    * its HIGH half, forced odd (a unit mod 2^k, so the nh positions
    * stay distinct). The halves must be independent: with a
    * power-of-two mask, a stride derived from the low bits would make
    * any base collision a collision at EVERY probe. All-Long
    * arithmetic: an Int `bits.length * 64` would overflow past 2^26
    * longs and silently address only a slice of a large filter. */
  @inline private def pos(h: Long, i: Int, mask: Long): Long = {
    val m = fmix64(h)
    val h2 = (m >>> 32) | 1L
    ((m + i * h2) & Long.MaxValue) & mask
  }

  def setHash(bits: Array[Long], h: Long, nh: Int): Unit = {
    val mask = bits.length.toLong * 64 - 1
    var i = 0
    while (i < nh) {
      val p = pos(h, i, mask)
      bits((p >>> 6).toInt) |= 1L << (p & 63).toInt
      i += 1
    }
  }

  def mightContain(bits: Array[Long], h: Long, nh: Int): Boolean = {
    val mask = bits.length.toLong * 64 - 1
    var i = 0
    while (i < nh) {
      val p = pos(h, i, mask)
      if ((bits((p >>> 6).toInt) & (1L << (p & 63).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  /** Longs for ~`bitsPerKey` bits per expected key, power-of-two sized
    * (the probe masks instead of dividing). bitsPerKey=16 with nh=4
    * gives ~0.24% false positives. Capped at 2^28 longs (2 GiB of
    * bits) — beyond that the filter should be sharded, not grown. */
  def numLongsFor(expectedKeys: Long, bitsPerKey: Int = 16): Int = {
    val bits = math.min(math.max(64L, expectedKeys * bitsPerKey), 1L << 34)
    var m = 64L
    while (m < bits) m <<= 1
    (m / 64).toInt
  }

  /** Bitset build: reduce sets nh bits per hash, merge is bitwise OR —
    * commutative/associative/idempotent, so any partitioning or row
    * order yields identical bits. */
  class BloomBitsAgg(numLongs: Int, nh: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(Integer.bitCount(numLongs) == 1, s"numLongs must be a power of two, got $numLongs")
    def zero: Array[Long] = new Array[Long](numLongs)
    def reduce(b: Array[Long], h: Long): Array[Long] = { setHash(b, h, nh); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Native probe: `mightContain(bits, child, nh)` with codegen — the
    * bits ride to executors as a referenced object inside the
    * serialized expression (they ARE the broadcast; ~numLongs*8 bytes). */
  case class BloomMightContain(child: Expression, bits: Array[Long], nh: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"bloom probe expects a 64-bit hash, got $other")
    }

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override def nullSafeEval(h: Any): Any =
      mightContain(bits, h.asInstanceOf[Long], nh)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      defineCodeGen(ctx, ev, h =>
        s"graft.ops.BloomJoin.mightContain($bitsRef, $h, $nh)")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  /** The hashed form both sides must share. Hashing the CANONICAL
    * STRING of the key instead of its raw bytes: Spark's xxhash64
    * hashes an INT (4 bytes) and a BIGINT (8 bytes) of the same value
    * differently, so raw-typed hashing of an int fact key against a
    * bigint dim key would miss EVERY bit — a false negative the exact
    * join can never repair (it only removes false positives). The
    * string cast makes equal values hash equal across numeric widths,
    * exactly like the equi-join's implicit cast makes them compare
    * equal. */
  def keyHash(key: Column): Column = xxhash64(key.cast("string"))

  /** Build the dim-side filter and return the probe predicate for any
    * 64-bit-hash column. Exposed separately from [[prunedLeftSemi]] so
    * the same bits can prune several scans (e.g. both join inputs of a
    * downstream self-join). */
  def buildFilter(dim: DataFrame, dimKey: Column,
                  numLongs: Int, nh: Int = 4): Array[Long] = {
    val agg = udaf(new BloomBitsAgg(numLongs, nh), Encoders.scalaLong)
    dim.select(keyHash(dimKey).as("h")).where(col("h").isNotNull)
      .agg(agg(col("h"))).head.getSeq[Long](0).toArray
  }

  def probe(bits: Array[Long], factKey: Column, nh: Int = 4): Column =
    GraftSqlShim.column(BloomMightContain(
      GraftSqlShim.expression(keyHash(factKey)), bits, nh))

  /** `fact LEFT SEMI JOIN dim ON factKey = dimKey`, Bloom-pruned.
    * Result is bitwise the plain semi-join (false positives removed by
    * the exact join; false negatives impossible — every dim key sets
    * its bits). The dim side is aggregated once (it is the small side
    * by contract) and the exact join is broadcast for the same reason. */
  def prunedLeftSemi(fact: DataFrame, factKey: Column,
                     dim: DataFrame, dimKey: Column,
                     numLongs: Int = 1 << 10, nh: Int = 4): DataFrame = {
    val bits = buildFilter(dim, dimKey, numLongs, nh)
    fact.where(probe(bits, factKey, nh))
      .join(broadcast(dim.select(dimKey.as("__bloom_key")).distinct()),
        factKey === col("__bloom_key"), "left_semi")
  }
}
