package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Incremental maintenance of the materialized MinHash fronts (the
  * IVM path for TextQueries.sigFront and its banded projection): the
  * per-process fronts are REBUILT today; a 100 TB pipeline instead
  * ingests new documents continuously and APPENDS their signature /
  * band-key rows via foreachBatch — the a_incremental_agg pattern
  * applied to MinHash. Correctness is structural: a signature is a
  * pure per-document function (no cross-document state), so
  * append-of-new-docs == full rebuild EXACTLY, provided the kernel is
  * the same expression the batch front persists — which these helpers
  * share by construction (TextOps.minhashSignature over distinct
  * 3-shingles, K=16; band keys 4x4). IncrementalFrontSpec proves
  * append-then-read equals full rebuild bit-for-bit across
  * micro-batches. */
object SigFrontStream {

  /** TextQueries.K — the signature width the batch front persists. */
  val K = 16

  /** Signature rows for a batch of raw (doc_id, text) documents: the
    * identical kernel sigFront materializes. */
  def sigRows(docsBatch: DataFrame): DataFrame =
    docsBatch.select(col("doc_id"),
      TextOps.minhashSignature(
        array_distinct(TextOps.shingles3(TextOps.tokens(col("text")))), K).as("sig"))

  /** Banded projection of signature rows — the LSH candidate keys
    * (band, key) the pair generators bucket-join on. */
  def bandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(TextOps.bandKeys(col("sig"), 4, 4)).as(Seq("band", "key")))

  /** foreachBatch sink body: append the batch's signature and band-key
    * rows to the persisted fronts. Append (not merge) is exact because
    * doc_ids are unique per document and signatures are per-doc pure —
    * re-delivered batches are the caller's concern (run the upstream
    * exact-dedup stage, or write per-batch files idempotently via
    * batchId naming at a real sink). */
  def appendToFronts(docsBatch: DataFrame, sigFrontPath: String,
                     bandFrontPath: String): Unit = {
    val sigs = sigRows(docsBatch)
    sigs.write.mode("append").parquet(sigFrontPath)
    bandRows(sigs).write.mode("append").parquet(bandFrontPath)
  }
}
