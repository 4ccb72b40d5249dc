package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark
import graft.ops.Raster

class CatalogTxnSpec extends AnyFunSuite {
  import spark.implicits._
  val TS = 4

  def freshStore() = {
    val root = java.nio.file.Files.createTempDirectory("graft_txn").toString
    new LayerStore(spark, root)
  }

  def tiles(vOff: Double) = Raster.assemble(
    (for (tc <- 0 to 1; tr <- 0 to 1; px <- 0 until TS; py <- 0 until TS)
      yield (tc, tr, px, py, vOff + px + py)).toDF("tile_col", "tile_row", "px", "py", "v"),
    TS, TS)

  def v00(df: org.apache.spark.sql.DataFrame): Double =
    df.where($"tile_col" === 0 && $"tile_row" === 0)
      .select($"cells").as[Seq[Double]].head().head

  test("commit publishes all layers and one log record") {
    val store = freshStore()
    val txn = new CatalogTxn(store)
    val seq = txn.commit(Seq(TxnWrite("a", 1, tiles(0)), TxnWrite("b", 2, tiles(100))))
    assert(seq == 1L)
    assert(store.read("a", 1).count() == 4)
    assert(store.read("b", 2).count() == 4)
    val recs = txn.log
    assert(recs.map(_._1) == Seq(1L))
    assert(recs.head._2.map(_._1).toSet == Set(("a", 1), ("b", 2)))
  }

  test("readAtomic pins the committed pair against a later per-layer clobber") {
    val store = freshStore()
    val txn = new CatalogTxn(store)
    txn.commit(Seq(TxnWrite("a", 1, tiles(0)), TxnWrite("b", 1, tiles(100))))
    store.write(tiles(999), "b", 1) // non-txn writer advances b's pointer
    assert(v00(store.read("b", 1)) == 999.0) // per-layer read: the clobber
    val snap = txn.readAtomic(Seq("a" -> 1, "b" -> 1))
    assert(v00(snap("a" -> 1)) == 0.0)
    assert(v00(snap("b" -> 1)) == 100.0) // snapshot read: the transaction
  }

  test("asOf reads an older catalog state; untouched layers fall back to live") {
    val store = freshStore()
    val txn = new CatalogTxn(store)
    val s1 = txn.commit(Seq(TxnWrite("a", 1, tiles(0)), TxnWrite("b", 1, tiles(100))))
    val s2 = txn.commit(Seq(TxnWrite("a", 1, tiles(7)))) // b not touched
    assert(s2 == s1 + 1)
    val now = txn.readAtomic(Seq("a" -> 1, "b" -> 1))
    assert(v00(now("a" -> 1)) == 7.0)   // newest record wins
    assert(v00(now("b" -> 1)) == 100.0) // folded from the older record
    val old = txn.readAtomic(Seq("a" -> 1, "b" -> 1), asOf = Some(s1))
    assert(v00(old("a" -> 1)) == 0.0)
    store.write(tiles(55), "c", 1) // a layer no transaction ever touched
    assert(v00(txn.readAtomic(Seq("c" -> 1))("c" -> 1)) == 55.0)
  }

  test("a GC'd pinned version fails loudly, never serves other data") {
    val store = freshStore() // retainVersions = 2
    val txn = new CatalogTxn(store)
    txn.commit(Seq(TxnWrite("g", 1, tiles(0))))
    store.write(tiles(1), "g", 1)
    store.write(tiles(2), "g", 1) // two publishes past the txn: its version is GC'd
    val e = intercept[IllegalStateException](txn.readAtomic(Seq("g" -> 1)))
    assert(e.getMessage.contains("GC'd"))
  }

  test("a layer whose txn history starts after asOf fails loudly, never leaks the future") {
    val store = freshStore()
    val txn = new CatalogTxn(store)
    val s1 = txn.commit(Seq(TxnWrite("a", 1, tiles(0))))
    txn.commit(Seq(TxnWrite("late", 1, tiles(100)))) // first-ever write, seq 2
    val e = intercept[IllegalStateException](
      txn.readAtomic(Seq("a" -> 1, "late" -> 1), asOf = Some(s1)))
    assert(e.getMessage.contains("no committed state"))
    // but a layer with an older record deeper in the log still resolves
    val s3 = txn.commit(Seq(TxnWrite("a", 1, tiles(7))))
    val snap = txn.readAtomic(Seq("a" -> 1), asOf = Some(s3 - 1))
    assert(v00(snap("a" -> 1)) == 0.0)
  }

  test("control characters in layer names are rejected before anything publishes") {
    val txn = new CatalogTxn(freshStore())
    intercept[IllegalArgumentException](txn.commit(Seq(TxnWrite("bad\tname", 1, tiles(0)))))
    intercept[IllegalArgumentException](txn.commit(Seq(TxnWrite("bad\nname", 1, tiles(0)))))
  }

  test("vacuumLog retires old records; a fully-retired layer reads as untouched") {
    val store = freshStore()
    val txn = new CatalogTxn(store)
    txn.commit(Seq(TxnWrite("v", 1, tiles(0))))
    txn.commit(Seq(TxnWrite("w", 1, tiles(1))))
    val s3 = txn.commit(Seq(TxnWrite("w", 1, tiles(2))))
    assert(txn.vacuumLog(keep = 1) == 2)
    assert(txn.log.map(_._1) == Seq(s3))
    // v's only record was retired: live-pointer fallback, not an error
    assert(v00(txn.readAtomic(Seq("v" -> 1))("v" -> 1)) == 0.0)
    // the sequence counter keeps monotone continuity past the vacuum
    assert(txn.commit(Seq(TxnWrite("v", 1, tiles(9)))) == s3 + 1)
  }

  test("duplicate (layer, zoom) in one transaction is rejected") {
    val txn = new CatalogTxn(freshStore())
    intercept[IllegalArgumentException](
      txn.commit(Seq(TxnWrite("d", 1, tiles(0)), TxnWrite("d", 1, tiles(1)))))
  }

  test("concurrent commits on disjoint layers both land, with distinct sequences") {
    val store = freshStore()
    val txn = new CatalogTxn(store)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val f1 = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = txn.commit(Seq(TxnWrite("p", 1, tiles(0))))
      })
      val f2 = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = txn.commit(Seq(TxnWrite("q", 1, tiles(100))))
      })
      val (s1, s2) = (f1.get(), f2.get())
      assert(s1 != s2)
      assert(txn.log.map(_._1) == Seq(s1, s2).sorted)
      assert(v00(txn.readAtomic(Seq("p" -> 1))("p" -> 1)) == 0.0)
      assert(v00(txn.readAtomic(Seq("q" -> 1))("q" -> 1)) == 100.0)
    } finally pool.shutdown()
  }
}
