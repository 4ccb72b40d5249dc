package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

/** IVM for the materialized MinHash fronts: ingesting the corpus in
  * micro-batches and APPENDING each batch's signature / band-key rows
  * (SigFrontStream.appendToFronts) must yield byte-identical content
  * to the full per-process rebuild (TextQueries.sigFront) — the
  * round-8 fronts become maintainable artifacts instead of
  * rebuild-only ones. */
class IncrementalFrontSpec extends AnyFunSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("append-then-read equals the full front rebuild bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivm").toString
    val sigPath = s"$tmp/sig_front"
    val bandPath = s"$tmp/band_front"

    val docRows = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    val third = docRows.length / 3
    val slices = Seq(docRows.take(third),
      docRows.slice(third, 2 * third), docRows.drop(2 * third))

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        SigFrontStream.appendToFronts(b, sigPath, bandPath)
      }
      .start()
    try {
      slices.foreach { s => input.addData(s.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    // full rebuild — the artifact every batch consumer reads
    val full = graft.queries.TextQueries.sigFront(spark, dir)
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toVector).toMap
    val inc = spark.read.parquet(sigPath)
      .as[(Long, Seq[Long])].collect().map(t => t._1 -> t._2.toVector).toMap
    assert(inc.size == full.size, s"sig rows: inc=${inc.size} full=${full.size}")
    val sigDiffs = full.collect { case (d, s) if inc.get(d) != Some(s) => d }
    assert(sigDiffs.isEmpty, s"signatures differ for docs ${sigDiffs.take(5)}")

    // the banded projection appended per batch equals the one derived
    // from the full front (same (doc_id, band, key) multiset)
    val fullBands = SigFrontStream.bandRows(
        graft.queries.TextQueries.sigFront(spark, dir))
      .as[(Long, Int, String)].collect().sorted.toVector
    val incBands = spark.read.parquet(bandPath)
      .as[(Long, Int, String)].collect().sorted.toVector
    assert(incBands == fullBands,
      s"band fronts differ: inc=${incBands.length} rows, full=${fullBands.length} rows")
  }
}
