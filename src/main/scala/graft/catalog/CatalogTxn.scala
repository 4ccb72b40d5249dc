package graft.catalog

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path, Paths}

/** One staged layer write inside a [[CatalogTxn.commit]]. */
final case class TxnWrite(name: String, zoom: Int, tiles: DataFrame,
                          tileSize: Int = graft.core.TileMath.DefaultTileSize,
                          crs: String = "EPSG:4326", binWidth: Double = 1.0,
                          withAttributes: Boolean = true)

/** Cross-layer atomic commits over [[LayerStore]]'s per-layer versioned
  * publish — the catalog-level transaction log.
  *
  * A transaction publishes one new version per touched (layer, zoom)
  * under ALL those layers' writer locks (acquired in sorted key order,
  * so concurrent transactions can never deadlock), then appends ONE
  * log record `_txn/_txn-SSSSSSSS` naming every published version —
  * via the same one-shot create-if-absent CAS the per-layer pointer
  * sequence uses. The record is the transaction's commit point for
  * snapshot readers:
  *
  *  - [[readAtomic]] resolves every requested layer from one log
  *    listing — the fold of committed records — so it can never observe
  *    a torn multi-layer state, even mid-commit: a record appears only
  *    after every version dir AND per-layer pointer is durable;
  *  - per-layer readers (`LayerStore.read`) still follow each layer's
  *    own newest pointer — individually consistent, with cross-layer
  *    atomicity living in the log (the contract object-store table
  *    formats give: multi-table atomicity is the catalog's, not the
  *    table pointer's);
  *  - a crash BETWEEN pointer publishes leaves some layers advanced
  *    and no record: snapshot readers keep resolving the previous
  *    record, and every advanced pointer names complete data;
  *  - snapshot validity is bounded by `LayerStore.retainVersions`
  *    exactly like `readVersion` time travel: a record whose version a
  *    later publish GC'd fails loudly rather than serving other data.
  *
  * Transactions on disjoint layer sets proceed in parallel (their layer
  * locks never collide) and race only the log-sequence CAS, which each
  * commit retries at the next free sequence — the log is a total order
  * of commit points, not a serialization bottleneck.
  */
class CatalogTxn(store: LayerStore) {

  private val TxnRe = "_txn-(\\d{8})".r
  private def txnDir: Path = Paths.get(s"${store.root}/_txn")

  /** Atomically publish `writes` (at most one per (layer, zoom)) and
    * append their log record. Returns the transaction sequence. */
  def commit(writes: Seq[TxnWrite]): Long = {
    require(writes.nonEmpty, "empty transaction")
    val keys = writes.map(w => (w.name, w.zoom))
    require(keys.distinct.size == keys.size,
      "a transaction may write each (layer, zoom) at most once")
    val ordered = writes.sortBy(w => (w.name, w.zoom)).toList
    withLocks(ordered) {
      val bindings = ordered.map { w =>
        store.writeVersion(w.name, w.zoom) { path =>
          store.writeTo(w.tiles, path)
          if (w.withAttributes) store.writeAttrs(path, w.tileSize, w.crs, w.binWidth)
        }
        // under this layer's lock our publish IS the live pointer
        val v = store.currentVersion(w.name, w.zoom).getOrElse(
          throw new IllegalStateException(
            s"just-published version of (${w.name}, ${w.zoom}) is unreadable"))
        ((w.name, w.zoom), v)
      }
      appendRecord(bindings)
    }
  }

  private def withLocks[T](layers: List[TxnWrite])(f: => T): T = layers match {
    case Nil => f
    case w :: rest => store.withLayerLock(w.name, w.zoom)(withLocks(rest)(f))
  }

  private def appendRecord(bindings: Seq[((String, Int), String)]): Long = {
    Files.createDirectories(txnDir)
    val content = bindings.map { case ((n, z), v) => s"$n\t$z\t$v" }.mkString("\n")
    // durable sibling + hard link = the content exists in full before
    // the sequence name appears (same publish shape as the pointers)
    val tmp = txnDir.resolve("_txn.tmp-" + java.util.UUID.randomUUID().toString.take(8))
    Files.write(tmp, content.getBytes("UTF-8"))
    def tryLink(seq: Long): Boolean =
      try { Files.createLink(txnDir.resolve(f"_txn-$seq%08d"), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    try {
      var seq = log.lastOption.map(_._1).getOrElse(0L) + 1
      while (!tryLink(seq)) seq += 1 // raced another commit's CAS: next slot
      seq
    } finally { Files.deleteIfExists(tmp): Unit }
  }

  /** Committed transactions, oldest first: (sequence, bindings). */
  def log: Seq[(Long, Seq[((String, Int), String)])] = {
    val d = txnDir.toFile
    if (!d.exists()) return Seq.empty
    Option(d.listFiles()).getOrElse(Array.empty).iterator.flatMap { f =>
      f.getName match {
        case TxnRe(s) =>
          try {
            val bs = new String(Files.readAllBytes(f.toPath), "UTF-8")
              .split("\n").iterator.filter(_.nonEmpty).map { line =>
                val Array(n, z, v) = line.split("\t")
                ((n, z.toInt), v)
              }.toSeq
            Some((s.toLong, bs))
          } catch { case _: java.io.IOException => None } // mid-GC listing race
        case _ => None
      }
    }.toSeq.sortBy(_._1)
  }

  /** Cross-layer consistent read: each requested layer at the version
    * the newest log record (with sequence <= `asOf`, if pinned) bound
    * it to; layers no transaction ever touched fall back to their own
    * live pointer. All resolutions come from one listing of the log,
    * so the result is a single committed catalog state — never a mix
    * of pre- and post-commit layers, whatever per-layer writers did in
    * between. */
  def readAtomic(layers: Seq[(String, Int)],
                 asOf: Option[Long] = None): Map[(String, Int), DataFrame] = {
    val records = log.filter(r => asOf.forall(r._1 <= _))
    layers.map { k =>
      val pinned = records.reverseIterator.flatMap { case (seq, bs) =>
        bs.collectFirst { case (`k`, v) => (seq, v) }
      }.nextOption()
      val df = pinned match {
        case Some((seq, v)) =>
          val p = s"${store.zoomDir(k._1, k._2)}/$v"
          if (!Files.isDirectory(Paths.get(p)))
            throw new IllegalStateException(
              s"transaction $seq pinned version $v of $k, but later publishes GC'd it " +
                "— raise retainVersions to cover your longest snapshot reader")
          store.readPath(p)
        case None => store.read(k._1, k._2)
      }
      k -> df
    }.toMap
  }
}
