package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ZOrderKey.zorder

/** Parquet-backed tile-layer catalog — the engine's spine (SURVEY §1.3).
  *
  * Reference model: an HDFS directory catalog with a JSON attribute store
  * and SFC-indexed layer writer (api/package.scala:62-180). Here:
  *
  *  - one parquet dataset per (layer_name, zoom), resolved through a
  *    version manifest (below) → partition-dir pruning replaces the
  *    attribute-store lookup + index range read;
  *  - rows sorted by zorder(tile_col, tile_row) within partitions before
  *    write (ZCurveKeyIndexMethod analog, api/package.scala:143) so
  *    parquet row-group min/max stats prune point/range reads;
  *  - per-(layer, zoom) metadata + zoom-0 histogram as a JSON sidecar
  *    `_attributes` inside the version dir (Utils.scala:85-89).
  *
  * == Versioned publish (crash atomicity + snapshot isolation) ==
  *
  * Every write lands in a fresh immutable version dir
  * `zoom=Z/v-NNNNNNNN/` and is made live by atomically replacing the
  * tiny `zoom=Z/_current` pointer file (write sibling tmp, then one
  * rename — POSIX rename(2) and HDFS rename are atomic; on object
  * stores the same publish maps to a conditional put of the pointer
  * key). Consequences, by construction rather than by recovery code:
  *
  *  - a crash at ANY point leaves `_current` resolving to a complete
  *    version — either the old one or the new one, never a half-swap
  *    (the old two-rename stage/retire swap had a window where the live
  *    dir did not exist, and a crash there made the next merge silently
  *    drop the whole prior layer);
  *  - readers that resolved the pointer before a publish keep reading
  *    their version's immutable files — the previous version is retained
  *    until the NEXT publish, so a merge under a running query never
  *    yanks that query's inputs (point-in-time snapshots, one deep);
  *  - a version dir orphaned by a crash mid-write is garbage, not state:
  *    it is never referenced and the next successful publish GCs it.
  *
  * Timing knobs exist for tests; production uses the defaults.
  */
class LayerStore(spark: SparkSession, val root: String,
                 staleLockMs: Long = 60000L,
                 lockWaitMs: Long = 120000L,
                 heartbeatMs: Long = 5000L) {

  import java.nio.file.{Files, Paths, Path, StandardCopyOption, StandardOpenOption, NoSuchFileException}

  private def zoomDir(name: String, zoom: Int) =
    s"$root/tiles/layer_name=$name/zoom=$zoom"

  private def pointerPath(name: String, zoom: Int): Path =
    Paths.get(s"${zoomDir(name, zoom)}/_current")

  /** The live version dir name (e.g. "v-00000003"), if published. */
  def currentVersion(name: String, zoom: Int): Option[String] =
    if (Files.exists(pointerPath(name, zoom)))
      Some(new String(Files.readAllBytes(pointerPath(name, zoom)), "UTF-8").trim)
    else None

  /** Resolves to the LIVE version dir only. An unpublished layer maps
    * to a non-existent path (clean "path does not exist" error) rather
    * than the zoom dir itself — falling back to the zoom dir would make
    * a read silently pick up crash-orphaned version dirs that were
    * never published (phantom data, doubled rows with two orphans). */
  private def dataPath(name: String, zoom: Int): String =
    currentVersion(name, zoom)
      .map(v => s"${zoomDir(name, zoom)}/$v")
      .getOrElse(s"${zoomDir(name, zoom)}/_unpublished")

  private val VersionRe = "v-(\\d{8})".r

  private def listVersions(name: String, zoom: Int): Seq[String] = {
    val d = new java.io.File(zoomDir(name, zoom))
    if (!d.exists()) Seq.empty
    else d.listFiles().iterator
      .filter(f => f.isDirectory && VersionRe.pattern.matcher(f.getName).matches())
      .map(_.getName).toSeq
  }

  private def nextVersionName(name: String, zoom: Int): String = {
    val mx = listVersions(name, zoom)
      .map { case VersionRe(n) => n.toLong }.foldLeft(0L)(math.max)
    f"v-${mx + 1}%08d"
  }

  /** Stage a new version via `writer`, then publish it. Caller must hold
    * the layer lock (all public write paths do). Old-version retention:
    * the immediate predecessor survives for in-flight readers; anything
    * older — including crash orphans — is GC'd. */
  private def writeVersion(name: String, zoom: Int)(writer: String => Unit): Unit = {
    val dir = zoomDir(name, zoom)
    Files.createDirectories(Paths.get(dir))
    val prev = currentVersion(name, zoom)
    val v = nextVersionName(name, zoom)
    writer(s"$dir/$v") // fully durable before the pointer moves
    verifyLockOwned(name, zoom)
    val tmp = Paths.get(s"$dir/_current.tmp-$v")
    Files.write(tmp, v.getBytes("UTF-8"))
    Files.move(tmp, pointerPath(name, zoom),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    listVersions(name, zoom)
      .filterNot(d => d == v || prev.contains(d))
      .foreach(d => rmTree(new java.io.File(s"$dir/$d")))
  }

  /** K1: versioned write with Z-curve ordering (api/package.scala:130-146),
    * then the `_attributes.json` sidecar (metadata + exact binned
    * histogram — Utils.scala:85-89 persists `histogramData` so the tile
    * server never re-aggregates the layer). The sidecar lives INSIDE the
    * version dir: underscore-prefixed files are invisible to Spark's
    * parquet scan, and the pointer swap publishes data + attributes
    * together. */
  def write(tiles: DataFrame, name: String, zoom: Int,
            tileSize: Int = graft.core.TileMath.DefaultTileSize,
            crs: String = "EPSG:4326", binWidth: Double = 1.0,
            withAttributes: Boolean = true): Unit = withLayerLock(name, zoom) {
    writeVersion(name, zoom) { path =>
      writeTo(tiles, path)
      if (withAttributes) writeAttrs(path, tileSize, crs, binWidth)
    }
  }

  private def writeTo(tiles: DataFrame, path: String): Unit =
    tiles
      .repartition(col("tile_col"), col("tile_row"))
      .sortWithinPartitions(zorder(col("tile_col").cast("int"), col("tile_row").cast("int")))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Compute + persist the sidecar from the just-written parquet (reading
    * back prunes to exactly the needed columns; the input lineage might
    * be arbitrarily expensive to re-evaluate). Two bounded jobs: a
    * key-column scan for bounds, one pixel pass for the histogram. */
  /** Driver-side histogram rows are bounded by value-range / binWidth,
    * not layer size — but an adversarial range (e.g. raw timestamps at
    * binWidth 1) would still blow the driver. Cap the bin count; the
    * effective width widens to keep the sidecar O(MaxBins). */
  private val MaxBins = 65536

  private def writeAttrs(path: String, tileSize: Int, crs: String, binWidth: Double): Unit = {
    val tiles = spark.read.parquet(path)
    val schemaJson = tiles.schema.json // read() supplies it -> no footer-inference job
    // layers without a flat `cells` column (e.g. a zipped multiband
    // `bands` layer) still get a sidecar — bounds + schema, no
    // histogram — instead of failing after the data job already ran
    if (!tiles.columns.contains("cells")) {
      val b = tiles.agg(
        min(col("tile_col")).as("c0"), max(col("tile_col")).as("c1"),
        min(col("tile_row")).as("r0"), max(col("tile_row")).as("r1"),
        count(lit(1)).as("n")).head()
      val attrs = LayerAttributes(
        cellType = "float64", crs = crs, tileCols = tileSize, tileRows = tileSize,
        minCol = if (b.isNullAt(0)) 0 else b.getInt(0),
        maxCol = if (b.isNullAt(1)) -1 else b.getInt(1),
        minRow = if (b.isNullAt(2)) 0 else b.getInt(2),
        maxRow = if (b.isNullAt(3)) -1 else b.getInt(3),
        nTiles = b.getLong(4), nCells = 0L,
        minV = 0.0, maxV = 0.0, binWidth = binWidth, // json4s can't round-trip NaN
        bins = Seq.empty, counts = Seq.empty,
        extent =
          if (b.isNullAt(0)) Seq.empty
          else Seq(b.getInt(0).toDouble * tileSize, b.getInt(2).toDouble * tileSize,
                   (b.getInt(1) + 1).toDouble * tileSize, (b.getInt(3) + 1).toDouble * tileSize),
        schemaJson = Some(schemaJson))
      Files.write(Paths.get(s"$path/_attributes.json"),
        LayerAttributes.toJson(attrs).getBytes("UTF-8")): Unit
      return
    }
    val dataCells = filter(col("cells"), x => not(isnan(x)))
    val b = tiles.agg(
      min(col("tile_col")).as("c0"), max(col("tile_col")).as("c1"),
      min(col("tile_row")).as("r0"), max(col("tile_row")).as("r1"),
      count(lit(1)).as("n"),
      min(array_min(dataCells)).as("vmin"), max(array_max(dataCells)).as("vmax")).head()
    val effWidth =
      if (b.isNullAt(5) || b.isNullAt(6)) binWidth
      else math.max(binWidth, (b.getDouble(6) - b.getDouble(5)) / MaxBins)
    val hist = graft.ops.Raster.pixelize(tiles, tileSize)
      .groupBy(floor(col("v") / effWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect() // <= MaxBins + 1 rows by construction
    val attrs = LayerAttributes(
      cellType = "float64", crs = crs, tileCols = tileSize, tileRows = tileSize,
      minCol = if (b.isNullAt(0)) 0 else b.getInt(0),
      maxCol = if (b.isNullAt(1)) -1 else b.getInt(1),
      minRow = if (b.isNullAt(2)) 0 else b.getInt(2),
      maxRow = if (b.isNullAt(3)) -1 else b.getInt(3),
      nTiles = b.getLong(4),
      nCells = hist.map(_.getLong(1)).sum,
      minV = if (hist.isEmpty) 0.0 else hist.map(_.getDouble(2)).min, // 0.0: json4s can't round-trip NaN
      maxV = if (hist.isEmpty) 0.0 else hist.map(_.getDouble(3)).max,
      binWidth = effWidth,
      bins = hist.map(_.getLong(0)).toSeq.sorted,
      counts = hist.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq,
      extent =
        if (b.isNullAt(0)) Seq.empty
        else Seq(b.getInt(0).toDouble * tileSize, b.getInt(2).toDouble * tileSize,
                 (b.getInt(1) + 1).toDouble * tileSize, (b.getInt(3) + 1).toDouble * tileSize),
      schemaJson = Some(schemaJson))
    Files.write(Paths.get(s"$path/_attributes.json"),
      LayerAttributes.toJson(attrs).getBytes("UTF-8")): Unit
  }

  /** S9: read the attribute sidecar of the live version (None for
    * unpublished layers). */
  def readAttributes(name: String, zoom: Int): Option[LayerAttributes] = {
    val f = Paths.get(s"${dataPath(name, zoom)}/_attributes.json")
    if (Files.exists(f))
      Some(LayerAttributes.fromJson(new String(Files.readAllBytes(f), "UTF-8")))
    else None
  }

  /** K1 space-time variant: SpaceTimeKey layers sort by Hilbert distance
    * within each time bucket (HilbertKeyIndexMethod,
    * api/package.scala:148-152) and partition additionally by time. The
    * `_attributes` sidecar (histogram over all time slices + schema)
    * rides along like the spatial write. */
  def writeSpaceTime(tiles: DataFrame, name: String, zoom: Int,
                     tileSize: Int = graft.core.TileMath.DefaultTileSize,
                     crs: String = "EPSG:4326", binWidth: Double = 1.0,
                     withAttributes: Boolean = true): Unit = withLayerLock(name, zoom) {
    writeVersion(name, zoom) { path =>
      tiles
        .repartition(col("time"), col("tile_col"), col("tile_row"))
        .sortWithinPartitions(col("time"),
          graft.functions.HilbertKey.hilbert(col("tile_col").cast("int"), col("tile_row").cast("int")))
        .write.mode(SaveMode.Overwrite).partitionBy("time")
        .parquet(path)
      if (withAttributes) writeAttrs(path, tileSize, crs, binWidth)
    }
  }

  /** Time-pruned read: the `time` predicate prunes partition dirs; the
    * sidecar schema (which includes the time partition column) skips
    * footer inference like the spatial read. */
  def readSpaceTime(name: String, zoom: Int, time: Option[String] = None): DataFrame = {
    val df = read(name, zoom)
    time.fold(df)(t => df.where(col("time") === t))
  }

  /** S3: pruned read of the live version of one (layer, zoom). The
    * sidecar's persisted schema skips parquet footer inference (one
    * fewer job per read — the attribute store playing the reference's
    * Metadata role, api/package.scala:62-65). The returned frame is
    * pinned to the resolved version dir: it stays valid across ONE
    * subsequent merge/write (previous version retained), giving readers
    * a point-in-time snapshot instead of a mid-swap mixture. */
  def read(name: String, zoom: Int): DataFrame = {
    val path = dataPath(name, zoom)
    val schema = {
      val f = Paths.get(s"$path/_attributes.json")
      if (Files.exists(f))
        LayerAttributes.fromJson(new String(Files.readAllBytes(f), "UTF-8")).schemaJson
          .map(js => org.apache.spark.sql.types.DataType.fromJson(js)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
      else None
    }
    schema.fold(spark.read)(s => spark.read.schema(s)).parquet(path)
  }

  /** S10: point lookup of a single tile — parquet predicate pushdown +
    * zorder-sorted row groups replace the reference's indexed
    * ValueReader (ServeLayerAsMap.scala:33,111). */
  def readTile(name: String, zoom: Int, tileCol: Int, tileRow: Int): DataFrame =
    read(name, zoom).where(col("tile_col") === tileCol && col("tile_row") === tileRow)

  /** S10 range form: bbox read — the reference's indexed
    * LayerQuery-with-bounds (api/package.scala:154-177). The zorder
    * sort groups spatially-near tiles into the same row groups, so the
    * pushed min/max predicates skip most of the file for a small bbox
    * (an indexed range read without an index structure). */
  def readRange(name: String, zoom: Int,
                c0: Int, r0: Int, c1: Int, r1: Int): DataFrame =
    read(name, zoom).where(
      col("tile_col") >= c0 && col("tile_col") <= c1 &&
        col("tile_row") >= r0 && col("tile_row") <= r1)

  /** K2: merge/upsert — read live version, cell-wise incoming-wins merge,
    * publish as a new version (api/package.scala:328-385).
    *
    * Durability: the merged output is fully written to a fresh version
    * dir while the source version's files stay untouched, so a cache
    * eviction mid-merge recomputes against intact inputs; the pointer
    * swap is the single atomic commit point, and the source version
    * survives it (GC'd only by the NEXT publish) — there is no window
    * in which the layer is missing or half-swapped. */
  def merge(incoming: DataFrame, name: String, zoom: Int,
            tileSize: Int = graft.core.TileMath.DefaultTileSize,
            crs: String = "EPSG:4326", binWidth: Double = 1.0,
            withAttributes: Boolean = true): Unit = withLayerLock(name, zoom) {
    val base = currentVersion(name, zoom)
    val toWrite =
      if (base.isEmpty) incoming
      else graft.ops.Raster.mergeLayers(read(name, zoom), incoming)
    writeVersion(name, zoom) { path =>
      writeTo(toWrite, path)
      if (withAttributes) writeAttrs(path, tileSize, crs, binWidth)
    }
  }

  /** Writer serialization for merge's read-modify-write: concurrent
    * upserts into one (layer, zoom) would each read the same base and
    * the last publish would silently drop the other's tiles. An
    * atomically created lock file (CREATE_NEW is atomic on POSIX, and
    * HDFS-style stores expose the same create-if-absent primitive)
    * serializes writers.
    *
    * Liveness vs safety: the holder HEARTBEATS the lock (touches its
    * mtime every [[heartbeatMs]] from a driver-side daemon thread), so
    * a lock older than [[staleLockMs]] means the holder really crashed —
    * a merge that legitimately runs long stays fresh and is never
    * broken, unlike a fixed create-time TTL. Breaking a stale lock is an
    * atomic RENAME to a unique grave name: of N waiters racing, exactly
    * one move succeeds (delete-then-create had a TOCTOU where a waiter
    * could delete a lock another waiter had just freshly created). The
    * lock body is a unique owner token, re-verified before every
    * publish ([[verifyLockOwned]]) and again at release so a holder
    * whose lock was broken aborts instead of publishing a lost update,
    * and never deletes a successor's lock. */
  private def lockPath(name: String, zoom: Int): Path =
    Paths.get(s"$root/.locks/layer_name=$name-zoom=$zoom.lock")

  // (name, zoom) -> (lock file, owner token) held by the current thread
  private val heldLocks = new ThreadLocal[Map[(String, Int), (Path, String)]] {
    override def initialValue(): Map[(String, Int), (Path, String)] = Map.empty
  }

  private[catalog] def withLayerLock[T](name: String, zoom: Int)(f: => T): T = {
    val lock = lockPath(name, zoom)
    Files.createDirectories(lock.getParent)
    val token = ProcessHandle.current().pid() + ":" + java.util.UUID.randomUUID()
    val deadline = System.currentTimeMillis + lockWaitMs
    var acquired = false
    while (!acquired) {
      try {
        Files.write(lock, token.getBytes("UTF-8"),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age = try System.currentTimeMillis - Files.getLastModifiedTime(lock).toMillis
                    catch { case _: NoSuchFileException => -1L }
          if (age > staleLockMs) {
            val grave = lock.resolveSibling(
              lock.getFileName.toString + ".broken-" + java.util.UUID.randomUUID())
            try { Files.move(lock, grave, StandardCopyOption.ATOMIC_MOVE); Files.deleteIfExists(grave): Unit }
            catch { case _: NoSuchFileException => () } // another waiter won the break
          } else if (System.currentTimeMillis > deadline)
            throw new IllegalStateException(s"timed out waiting for writer lock on ($name, $zoom)")
          else Thread.sleep(100)
      }
    }
    val beating = new java.util.concurrent.atomic.AtomicBoolean(true)
    val hb = new Thread(() => {
      while (beating.get) {
        try Thread.sleep(heartbeatMs) catch { case _: InterruptedException => () }
        if (beating.get)
          try Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis))
          catch { case _: java.io.IOException => () } // broken-as-stale: verify catches it
      }
    }, s"graft-lock-heartbeat-$name-$zoom")
    hb.setDaemon(true)
    hb.start()
    heldLocks.set(heldLocks.get + ((name, zoom) -> (lock, token)))
    try f
    finally {
      heldLocks.set(heldLocks.get - ((name, zoom)))
      beating.set(false); hb.interrupt()
      // Release only our own lock: if it was broken while we were
      // (wrongly) presumed dead, the file now holds a successor's token.
      // The read-then-delete pair is not atomic — in the worst
      // interleaving (we stall past staleLockMs, a breaker replaces the
      // lock between our read and delete) we can delete a successor's
      // fresh lock. That race cannot lose an update: every publish
      // re-reads the lock under verifyLockOwned, and a writer whose
      // token is no longer in the file aborts before its pointer swap —
      // the damage is a wasted merge, not corruption.
      try {
        if (new String(Files.readAllBytes(lock), "UTF-8") == token)
          Files.deleteIfExists(lock): Unit
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Abort a publish whose writer lock no longer holds our token — the
    * lock was broken as stale, so a successor may already be merging
    * from the version we are about to replace. */
  private def verifyLockOwned(name: String, zoom: Int): Unit =
    heldLocks.get.get((name, zoom)).foreach { case (lock, token) =>
      val held =
        try new String(Files.readAllBytes(lock), "UTF-8")
        catch { case _: java.io.IOException => "" }
      if (held != token)
        throw new IllegalStateException(
          s"writer lock on ($name, $zoom) was lost before publish — aborting to avoid a lost update")
    }

  /** Compaction — the small-file problem at scale: a long upsert
    * history leaves a version with many small parquet files, and on an
    * object store every file is a request + a seek. Rewrites the live
    * version into ~[[targetBytes]]-sized files (computed from the
    * actual on-disk size, not a guessed partition count) and publishes
    * it like any other write; readers never see an intermediate state
    * and the pre-compaction version survives until the next publish. */
  def compact(name: String, zoom: Int, targetBytes: Long = 128L << 20): Unit =
    withLayerLock(name, zoom) {
      val live = dataPath(name, zoom)
      // size on parquet data bytes only — sidecar/_SUCCESS/checksum
      // files are bookkeeping, not the thing being split
      val bytes = {
        def sz(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(sz).sum
          else if (f.getName.endsWith(".parquet")) f.length()
          else 0L
        sz(new java.io.File(live))
      }
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val tiles = spark.read.parquet(live)
      val spaceTime = tiles.columns.contains("time")
      writeVersion(name, zoom) { path =>
        // preserve the layer's layout contract: space-time layers keep
        // their time partition dirs (readSpaceTime's pruning) and
        // time-major Hilbert order; spatial layers keep the zorder sort
        val writer =
          if (spaceTime)
            tiles.repartition(nFiles, col("time"))
              .sortWithinPartitions(col("time"),
                graft.functions.HilbertKey.hilbert(col("tile_col").cast("int"), col("tile_row").cast("int")))
              .write.partitionBy("time")
          else
            tiles.repartition(nFiles, col("tile_col"), col("tile_row"))
              .sortWithinPartitions(zorder(col("tile_col").cast("int"), col("tile_row").cast("int")))
              .write
        writer.mode(SaveMode.Overwrite).parquet(path)
        val attrs = Paths.get(s"$live/_attributes.json")
        if (Files.exists(attrs)) // metadata unchanged by compaction
          Files.copy(attrs, Paths.get(s"$path/_attributes.json")): Unit
      }
    }

  /** Vacuum: reclaim everything except the LIVE version — the retired
    * predecessor (calling vacuum DECLARES no readers are in flight; use
    * the automatic publish-time GC if they might be), crash-orphaned
    * version dirs, orphaned `_current.tmp-*` pointer staging files, and
    * this layer's lock debris (grave files from interrupted breaks).
    * Returns the number of entries removed. */
  def vacuum(name: String, zoom: Int): Int = withLayerLock(name, zoom) {
    var removed = 0
    val dir = zoomDir(name, zoom)
    val live = currentVersion(name, zoom)
    listVersions(name, zoom).filterNot(v => live.contains(v)).foreach { v =>
      rmTree(new java.io.File(s"$dir/$v")); removed += 1
    }
    val d = new java.io.File(dir)
    if (d.exists())
      d.listFiles().filter(_.getName.startsWith("_current.tmp-")).foreach { f =>
        if (f.delete()) removed += 1
      }
    // only THIS layer's graves: vacuum holds only this layer's lock,
    // and another layer's grave may belong to a break in progress
    val locks = new java.io.File(s"$root/.locks")
    val lockName = lockPath(name, zoom).getFileName.toString
    if (locks.exists())
      locks.listFiles()
        .filter(f => f.getName.startsWith(lockName + ".broken-"))
        .foreach { f => if (f.delete()) removed += 1 }
    removed
  }

  /** S9: catalog listing. A layer exists once a version is published. */
  def exists(name: String, zoom: Int): Boolean =
    currentVersion(name, zoom).isDefined

  def zoomsOf(name: String): Seq[Int] = {
    val d = new java.io.File(s"$root/tiles/layer_name=$name")
    if (!d.exists()) Seq.empty
    else d.listFiles().filter(_.isDirectory)
      .map(_.getName.stripPrefix("zoom=").toInt)
      .filter(exists(name, _)) // a crashed never-published zoom is not a zoom
      .sorted.toSeq
  }

  def maxZoom(name: String): Option[Int] = zoomsOf(name).lastOption

  /** K3: delete one zoom or all zooms of a layer (api/package.scala:67-102). */
  def delete(name: String, zoom: Option[Int] = None): Unit = {
    val target = zoom match {
      case Some(z) => new java.io.File(zoomDir(name, z))
      case None => new java.io.File(s"$root/tiles/layer_name=$name")
    }
    rmTree(target)
  }

  private def rmTree(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(): Unit
  }
}
