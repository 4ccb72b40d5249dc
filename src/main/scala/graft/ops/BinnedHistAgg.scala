package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-width binned histogram as a [[TypedImperativeAggregate]] — the
  * Catalyst surface Spark's own sketch aggregates (percentile_approx,
  * HLL) are built on, one level below the typed `Aggregator`s the rest
  * of ops/ uses (KMV, CMS, tile assembly). The buffer is a primitive
  * long array updated in place (no per-row allocation, no encoder
  * round-trip) and serialized as raw little-endian bytes for shuffle —
  * exactly the shape a 100 TB histogram wants: the corpus collapses to
  * nBins+2 longs per group map-side, and only those cross the wire.
  *
  * Counts are integers and merge is elementwise add, so the result is
  * bit-deterministic under ANY partitioning/merge order — the gate
  * (a_hist_sketch) hash-matches a relational CASE-binning twin in
  * DuckDB built from the identical FLOOR((x−lo)/width) arithmetic.
  *
  * Layout: slot 0 = underflow (x < lo), slots 1..nBins = the bins
  * [lo+(i−1)·width, lo+i·width), slot nBins+1 = overflow (x ≥ lo+nBins·width).
  * Replaces GeoTrellis's StreamingHistogram use in the reference
  * (`Histograms.scala` sidecar path) for the fixed-width case; the
  * quantile-breaks serving path derives breaks from these exact bins.
  */
case class BinnedHist(
    child: Expression,
    lo: Double,
    width: Double,
    nBins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nBins > 0 && width > 0, s"need nBins > 0 and width > 0, got $nBins/$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = math.floor((v.asInstanceOf[Double] - lo) / width)
      val i = if (b < 0) 0 else if (b >= nBins) nBins + 1 else b.toInt + 1
      buf(i) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BinnedHist =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BinnedHist =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "binned_hist"
}

object BinnedHist {
  /** `binned_hist(x, lo, width, nBins)` — counts per fixed-width bin
    * plus underflow/overflow slots, as array<bigint>. Input is cast to
    * double (the bin arithmetic is defined on doubles so the SQL twin
    * can replay it exactly). */
  def hist(c: Column, lo: Double, width: Double, nBins: Int): Column =
    GraftSqlShim.column(
      BinnedHist(GraftSqlShim.expression(c.cast("double")), lo, width, nBins)
        .toAggregateExpression())
}
