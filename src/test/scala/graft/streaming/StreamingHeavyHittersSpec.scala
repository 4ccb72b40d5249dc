package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Streaming twin of the t_cms_heavy sketch stage: the SAME CountMin
  * udaf ([[graft.ops.Sketches.countMin]]) run as a streaming global
  * aggregate (complete mode) over an unbounded token stream must end
  * at EXACTLY the matrix the batch pass builds — the mergeability law
  * the aggregator's partition/merge contract promises, exercised
  * across micro-batch boundaries instead of shuffle partitions. This
  * is the ingest-time heavy-hitters monitor: the sketch is O(d·w)
  * state however many tokens stream through, so the streaming side
  * carries constant state at 100 TB where an exact streaming count
  * would grow with the vocabulary.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  import spark.implicits._

  private val (d, w) = (4, 64)

  test("streamed CountMin sketch equals the batch sketch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val toks = Seq.tabulate(500)(i => s"tok${i % 37}") ++ Seq.fill(50)("hot")

    val batch = toks.toDF("tok")
      .agg(graft.ops.Sketches.countMin(col("tok"), d, w).as("m"))
      .head.getSeq[Long](0)

    val input = MemoryStream[String]
    val q = input.toDS().toDF("tok")
      .agg(graft.ops.Sketches.countMin(col("tok"), d, w).as("m"))
      .writeStream.format("memory").queryName("cms_out").outputMode("complete")
    val run = q.start()
    // three micro-batches so merge actually crosses batch boundaries
    toks.grouped(200).foreach { chunk =>
      input.addData(chunk: _*); run.processAllAvailable()
    }
    run.stop()

    val streamed = spark.table("cms_out").head.getSeq[Long](0)
    assert(streamed == batch)

    // non-vacuity: the sketch actually over-approximates the hot token
    val est = graft.ops.Sketches.cmsEstimate(streamed.toIndexedSeq, d, w, "hot")
    assert(est >= 50, s"hot token estimate $est must be >= its exact count 50")
    val estCold = graft.ops.Sketches.cmsEstimate(streamed.toIndexedSeq, d, w, "tok5")
    assert(estCold >= 14, "every estimate upper-bounds the exact count")
  }
}
