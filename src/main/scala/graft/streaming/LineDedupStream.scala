package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch line/chunk-level dedup
  * (TextQueries.lineDedup — the C4/RefinedWeb boilerplate-removal
  * granularity): a repeated fixed-width token chunk is kept exactly
  * once corpus-wide — by the first document that carries it, at its
  * smallest chunk index within that document. The real 100 TB
  * pipeline INGESTS (it does not re-batch), so the keeper decision
  * must be makeable incrementally: per-chunk-hash state is ONE seen
  * bit, sharded across executors by the same hash key the batch
  * groupBy exchanges on, and its size is the distinct-chunk count —
  * independent of stream length (bound it further with a watermark +
  * state TTL when chunk recurrence has a horizon).
  *
  * Ordering contract (what makes stream == batch EXACT): documents
  * arrive in ascending doc_id order across micro-batches — then
  * first-batch-wins equals the batch gate's min-doc_id keeper;
  * in-batch disorder is resolved here by taking the min (doc_id, idx)
  * of the group, which equals the batch tie-break. Out-of-order
  * ingestion needs an upstream watermark+sort stage (the
  * AnomalyStream contract). StreamingLineDedupSpec proves the flags
  * are bit-identical to the batch gate across micro-batch boundaries
  * on a shared fixture. */
object LineDedupStream {

  case class Chunk(doc_id: Long, idx: Int, h: Long, n_toks: Int)
  case class ChunkFlag(doc_id: Long, idx: Int, h: Long, n_toks: Int, keep: Boolean)

  /** Flag every incoming chunk with the corpus-wide keeper decision:
    * keep = this hash was never seen in any earlier micro-batch AND
    * this row is the (doc_id, idx)-min of the hash within this batch. */
  def dedupChunks(chunks: Dataset[Chunk]): Dataset[ChunkFlag] = {
    import chunks.sparkSession.implicits._
    chunks
      .groupByKey(_.h)
      .flatMapGroupsWithState[Boolean, ChunkFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          val seen = state.getOption.getOrElse(false)
          val batch = rows.toVector.sortBy(c => (c.doc_id, c.idx))
          state.update(true)
          batch.zipWithIndex.iterator.map { case (c, i) =>
            ChunkFlag(c.doc_id, c.idx, c.h, c.n_toks, keep = !seen && i == 0)
          }
      }
  }
}
