package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** Stream == batch for the line/chunk-level dedup (t_line_dedup's
  * semantics run incrementally): the same sf0.001 documents, ingested
  * in three doc_id-ordered micro-batches, must reproduce the batch
  * gate's per-doc (n_chunks, n_kept, kept_tokens) BIT-FOR-BIT —
  * including hashes that recur across micro-batch boundaries (the
  * whole point: the keeper decided in batch 1 suppresses the copy
  * arriving in batch 3). */
class StreamingLineDedupSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val ChunkTokens = 16 // TextQueries.ChunkTokens (the C4 window)

  test("stream line dedup equals the batch gate across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext

    val expected = graft.SparkEntry.queries("t_line_dedup")(spark, dir)
      .select($"doc_id", $"n_chunks", $"n_kept", $"kept_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    val docRows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(docRows.length >= 9, "fixture must be large enough to split 3 ways")
    val slices = {
      val third = docRows.length / 3
      Seq(docRows.take(third), docRows.slice(third, 2 * third), docRows.drop(2 * third))
    }

    val input = MemoryStream[(Long, String)]
    val chunks = input.toDS().toDF("doc_id", "text")
      .select($"doc_id",
        posexplode(graft.text.TextOps.chunkTexts(
          graft.text.TextOps.tokens($"text"), ChunkTokens)).as(Seq("idx", "chunk")))
      .select($"doc_id", $"idx",
        graft.text.TextOps.h60($"chunk").as("h"),
        size(split($"chunk", " ")).as("n_toks"))
      .as[LineDedupStream.Chunk]
    val flagged = LineDedupStream.dedupChunks(chunks)

    val q = flagged.writeStream.format("memory").queryName("line_dedup_out")
      .outputMode("append").start()
    try {
      slices.foreach { s =>
        input.addData(s.toIndexedSeq)
        q.processAllAvailable() // force a micro-batch boundary per slice
      }
    } finally q.stop()

    val got = spark.table("line_dedup_out")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum($"keep".cast("long")).as("n_kept"),
        sum(($"keep".cast("long")) * $"n_toks").as("kept_tokens"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(got.size == expected.size,
      s"doc coverage: stream=${got.size} batch=${expected.size}")
    val diffs = expected.collect {
      case (d, e) if got.get(d) != Some(e) => s"doc $d: batch=$e stream=${got.get(d)}"
    }
    assert(diffs.isEmpty, s"stream != batch for ${diffs.size} docs:\n${diffs.take(5).mkString("\n")}")
  }

  test("a chunk hash recurring ONLY across micro-batch boundaries is still suppressed") {
    // minimal cross-boundary fixture: the shared header chunk arrives
    // again two batches later from a different doc — state must
    // remember it; a fresh body chunk in the later batch survives
    implicit val sqlCtx = spark.sqlContext
    val header = (1 to ChunkTokens).map(i => s"s$i").mkString(" ")
    val body = (1 to ChunkTokens).map(i => s"p$i").mkString(" ")
    val input = MemoryStream[(Long, String)]
    val chunks = input.toDS().toDF("doc_id", "text")
      .select($"doc_id",
        posexplode(graft.text.TextOps.chunkTexts(
          graft.text.TextOps.tokens($"text"), ChunkTokens)).as(Seq("idx", "chunk")))
      .select($"doc_id", $"idx",
        graft.text.TextOps.h60($"chunk").as("h"),
        size(split($"chunk", " ")).as("n_toks"))
      .as[LineDedupStream.Chunk]
    val q = LineDedupStream.dedupChunks(chunks)
      .writeStream.format("memory").queryName("line_dedup_xb")
      .outputMode("append").start()
    try {
      input.addData((1L, header)); q.processAllAvailable()
      input.addData((2L, "interim unrelated content words")); q.processAllAvailable()
      input.addData((3L, s"$header $body")); q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("line_dedup_xb").where($"keep")
      .select($"doc_id", $"idx").as[(Long, Int)].collect().toSet
    assert(kept.contains((1L, 0)), "first arrival of the header keeps it")
    assert(!kept.contains((3L, 0)), "the header copy two batches later is suppressed")
    assert(kept.contains((3L, 1)), "doc 3's fresh body chunk survives")
  }
}
