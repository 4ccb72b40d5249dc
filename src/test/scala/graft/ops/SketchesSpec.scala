package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark
import graft.text.TextOps

class SketchesSpec extends AnyFunSuite {
  import spark.implicits._

  private def sketchOf(values: Seq[Long], k: Int): Array[Long] = {
    val a = new Sketches.KmvDistinct(k)
    values.foldLeft(a.zero)((b, v) => a.reduce(b, v))
  }

  test("kmv: reduce keeps the k smallest DISTINCT hashes, sorted") {
    val a = new Sketches.KmvDistinct(4)
    val vals = Seq(50L, 10L, 50L, 30L, 20L, 40L, 10L, 5L)
    val buf = vals.foldLeft(a.zero)((b, v) => a.reduce(b, v))
    assert(buf.toSeq == Seq(5L, 10L, 20L, 30L))
  }

  test("kmv: merge law — any split/order gives the sketch of the whole") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(500)(rnd.nextLong() & Long.MaxValue)
    val agg = new Sketches.KmvDistinct(16)
    val whole = sketchOf(vals, 16).toSeq
    for (seed <- 0 until 30) {
      val r = new scala.util.Random(seed)
      val shuffled = r.shuffle(vals)
      val cut = 1 + r.nextInt(shuffled.length - 1)
      val (l, rr) = shuffled.splitAt(cut)
      val merged = agg.merge(sketchOf(l, 16), sketchOf(rr, 16))
      assert(merged.toSeq == whole)
    }
  }

  test("kmv: exact below k, estimate within expected band above") {
    // below k: sketch IS the distinct set
    val small = Seq(3L, 1L, 3L, 2L)
    assert(Sketches.estimate(sketchOf(small, 8), 8) == 3.0)
    // above k: hash real strings, expect ~1/sqrt(k-2) relative error
    val n = 20000
    val hashes = (0 until n).map(i => TextOps.hash60(s"key-$i"))
    val est = Sketches.estimate(sketchOf(hashes.map(h => h: Long), 256), 256)
    assert(math.abs(est - n) / n < 0.2, s"est $est for n=$n")
  }

  test("kmv: distributed aggregation equals driver-side fold") {
    val vals = (0 until 5000).map(i => TextOps.hash60(s"v${i % 1234}"))
    val viaSpark = vals.toDF("h").repartition(7)
      .agg(Sketches.kmvDistinct(col("h"), 64)).head.getDouble(0)
    val viaFold = Sketches.estimate(sketchOf(vals, 64), 64)
    assert(viaSpark == viaFold)
    // and the raw-sketch aggregator returns the same k-min set
    val rawSpark = vals.toDF("h").repartition(5)
      .agg(Sketches.kmvSketch(col("h"), 64)).head.getSeq[Long](0).toSeq
    assert(rawSpark == sketchOf(vals, 64).toSeq)
  }

  test("cms: overestimates only, within the 2N/w bound, merge order-free") {
    val (d, w) = (4, 256)
    val rnd = new scala.util.Random(11)
    // zipf-ish: token i appears ~ 2000/(i+1) times
    val stream = (0 until 200).flatMap(i => Seq.fill(2000 / (i + 1))(s"tok$i"))
    val shuffled = rnd.shuffle(stream)
    val agg = new Sketches.CountMin(d, w)
    val whole = shuffled.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = stream.size
    exact.foreach { case (t, c) =>
      val e = Sketches.cmsEstimate(whole.toIndexedSeq, d, w, t)
      assert(e >= c, s"$t underestimated: $e < $c")
      assert(e - c <= 2L * n / w + 1, s"$t over by ${e - c} (N=$n, w=$w)")
    }
    // split/merge law
    val (l, r) = shuffled.splitAt(shuffled.length / 3)
    val merged = agg.merge(
      l.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)),
      r.foldLeft(agg.zero)((b, t) => agg.reduce(b, t)))
    assert(merged.toSeq == whole.toSeq)
    // distributed == driver fold
    val viaSpark = shuffled.toDF("t").repartition(6)
      .agg(Sketches.countMin(col("t"), d, w)).head.getSeq[Long](0)
    assert(viaSpark == whole.toSeq)
  }

  test("kmv: same aggregator runs in a streaming windowed aggregation") {
    // the a_kmv_window shape under Structured Streaming: per-window
    // distinct-user sketches with k longs of state per window, and the
    // streaming answer equals the batch answer on the same rows
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = (0 until 300).map(i =>
      (t(f"2024-01-01 00:${i / 60 % 5}%02d:${i % 60}%02d"), (i % 97).toLong))
    val agged = input.toDS().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .select(window(col("ts"), "5 minutes").as("w"),
        TextOps.h60(col("user_id").cast("string")).as("h"))
      .groupBy(col("w"))
      .agg(Sketches.kmvDistinct(col("h"), 64).as("kmv_users"))
    input.addData(rows: _*)
    val q = agged.writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("kmv_stream_out")
      .select(col("w.start").cast("long"), col("kmv_users"))
      .as[(Long, Double)].collect().toMap
    val batch = rows.toDF("ts", "user_id")
      .select(window(col("ts"), "5 minutes").as("w"),
        TextOps.h60(col("user_id").cast("string")).as("h"))
      .groupBy(col("w"))
      .agg(Sketches.kmvDistinct(col("h"), 64).as("kmv_users"))
      .select(col("w.start").cast("long"), col("kmv_users"))
      .as[(Long, Double)].collect().toMap
    assert(streamed == batch && batch.nonEmpty)
    // 97 distinct users > k=64: every window is in the estimation branch
    assert(batch.values.forall(v => v > 50 && v < 200))
  }

  test("kmv set ops: union is exact, jaccard/intersection track truth") {
    val k = 256
    val aVals = (0 until 4000).map(i => TextOps.hash60(s"a-$i"))
    val shared = (0 until 2000).map(i => TextOps.hash60(s"s-$i"))
    val bVals = (0 until 4000).map(i => TextOps.hash60(s"b-$i"))
    val sa = sketchOf(aVals ++ shared, k)
    val sb = sketchOf(bVals ++ shared, k)
    assert(Sketches.KmvSketch.union(sa, sb, k).toSeq ==
      sketchOf(aVals ++ shared ++ bVals, k).toSeq)
    val j = Sketches.KmvSketch.jaccard(sa, sb, k) // truth: 2000/10000
    assert(j > 0.1 && j < 0.3, s"jaccard $j")
    val inter = Sketches.KmvSketch.intersectionEstimate(sa, sb, k)
    assert(inter > 1000 && inter < 3000, s"intersection $inter")
  }

  // ---------------------------------------------------------------- HLL

  private def hllOf(hashes: Seq[Long], p: Int): Array[Int] = {
    val a = new Sketches.HllSketchAgg(p)
    hashes.foldLeft(a.zero)((b, h) => a.reduce(b, h))
  }

  test("hll: register index and rho decode the hash exactly") {
    val a = new Sketches.HllSketchAgg(8)
    // idx = top 8 of 60 bits; w = low 52. Craft h = (idx << 52) | w.
    val h1 = (5L << 52) | (1L << 40) // w has bitlen 41 → rho = 52 - 41 + 1 = 12
    val b = a.reduce(a.zero, h1)
    assert(b(5) == 12 && b.count(_ != 0) == 1)
    val h2 = 7L << 52 // w = 0 → rho = 53
    val b2 = a.reduce(b, h2)
    assert(b2(7) == 53)
    // a smaller rho for the same register must not lower it
    val h3 = (5L << 52) | (1L << 51) // rho = 1
    assert(a.reduce(b2, h3)(5) == 12)
  }

  test("hll: merge law — any split/order gives the registers of the whole") {
    val hashes = (0 until 2000).map(i => TextOps.hash60(s"hll-$i"): Long)
    val a = new Sketches.HllSketchAgg(8)
    val whole = hllOf(hashes, 8).toSeq
    for (seed <- 0 until 20) {
      val r = new scala.util.Random(seed)
      val shuffled = r.shuffle(hashes)
      val cut = 1 + r.nextInt(shuffled.length - 1)
      val (l, rr) = shuffled.splitAt(cut)
      assert(a.merge(hllOf(l, 8), hllOf(rr, 8)).toSeq == whole)
    }
  }

  test("hll: estimate within the 1.04/sqrt(m) band; union is lossless") {
    val n = 30000
    val hashes = (0 until n).map(i => TextOps.hash60(s"key-$i"): Long)
    val est = Sketches.hllEstimate(hllOf(hashes, 8).toSeq, 8)
    assert(math.abs(est - n) / n < 0.2, s"est $est for n=$n")
    // small range: linear counting keeps tiny sets near-exact
    val tiny = (0 until 40).map(i => TextOps.hash60(s"t-$i"): Long)
    val estTiny = Sketches.hllEstimate(hllOf(tiny, 8).toSeq, 8)
    assert(math.abs(estTiny - 40) / 40 < 0.25, s"tiny est $estTiny")
    // union of sketches == sketch of concatenation, exactly
    val (ha, hb) = hashes.splitAt(n / 3)
    assert(Sketches.hllUnion(hllOf(ha, 8).toSeq, hllOf(hb, 8).toSeq) == hllOf(hashes, 8).toSeq)
  }

  test("hll: same aggregator runs in a streaming windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = (0 until 300).map(i =>
      (t(f"2024-01-01 00:${i / 60 % 5}%02d:${i % 60}%02d"), (i % 97).toLong))
    def agged(df: org.apache.spark.sql.DataFrame) = df
      .select(window(col("ts"), "5 minutes").as("w"),
        TextOps.h60(col("user_id").cast("string")).as("h"))
      .groupBy(col("w"))
      .agg(Sketches.hllSketch(col("h"), 8).as("regs"))
      .select(col("w.start").cast("long").as("ws"), col("regs"))
    input.addData(rows: _*)
    val q = agged(input.toDS().toDF("ts", "user_id").withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("hll_stream_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("hll_stream_out")
      .as[(Long, Seq[Int])].collect().toMap
    val batch = agged(rows.toDF("ts", "user_id")).as[(Long, Seq[Int])].collect().toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("hll window: streaming twin equals the a_hll_window gate across micro-batches") {
    // the gate's rows (win_start, exact_users, denom_users, zeros_users)
    // rebuilt by a complete-mode streaming query over the SAME events
    // rows fed in three micro-batches — merge law under real
    // incremental state, proven bitwise against the batch gate
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.Fixtures.events(spark, sf)
      .select(col("ts"), col("user_id"))
      .as[(java.sql.Timestamp, Long)].collect().toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long)]
    // no countDistinct here: Spark rejects distinct aggs on streams —
    // the HLL registers are the streaming-legal replacement, which is
    // the point of the operator; the twin therefore compares the
    // sketch-derived columns of the gate
    val agged = input.toDS().toDF("ts", "user_id")
      .select(window(col("ts"), "5 minutes").as("w"),
        TextOps.h60(col("user_id").cast("string")).as("h"))
      .groupBy(col("w"))
      .agg(Sketches.hllSketch(col("h"), 8).as("r"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        expr("aggregate(r, CAST(0 AS BIGINT), (acc, x) -> acc + shiftleft(CAST(1 AS BIGINT), 53 - x))").as("denom_users"),
        expr("aggregate(r, CAST(0 AS BIGINT), (acc, x) -> acc + IF(x = 0, 1, 0))").as("zeros_users"))
    val q = agged.writeStream.format("memory").queryName("hll_win_stream")
      .outputMode("complete").start()
    try {
      rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("hll_win_stream")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = graft.queries.AdvancedQueries.hllWindow(spark, sf)
      .select(col("win_start"), col("denom_users"), col("zeros_users"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("hll: distributed aggregation equals driver-side fold") {
    val hashes = (0 until 5000).map(i => TextOps.hash60(s"v${i % 987}"): Long)
    val viaSpark = hashes.toDF("h").repartition(7)
      .agg(Sketches.hllSketch(col("h"), 8)).head.getSeq[Int](0).toSeq
    assert(viaSpark == hllOf(hashes, 8).toSeq)
  }
}

class BloomJoinSpec extends AnyFunSuite {
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("bloom bits: no false negatives, measured FP rate near theory") {
    val bits = new Array[Long](1 << 7) // 8192 bits
    val members = (0 until 500).map(i => TextOps.hash60(s"m$i"))
    members.foreach(h => BloomJoin.setHash(bits, h, 4))
    assert(members.forall(h => BloomJoin.mightContain(bits, h, 4)))
    val probes = (0 until 20000).map(i => TextOps.hash60(s"x$i"))
    val fp = probes.count(h => BloomJoin.mightContain(bits, h, 4)).toDouble / probes.size
    // ~16 bits/key, nh=4 -> theory ~0.24%; allow slack
    assert(fp < 0.02, s"false-positive rate $fp")
  }

  test("bloom agg: bit-OR merge is order/partition free") {
    val vals = (0 until 2000).map(i => TextOps.hash60(s"k$i"))
    val agg = new BloomJoin.BloomBitsAgg(64, 4)
    val one = vals.foldLeft(agg.zero)((b, h) => agg.reduce(b, h))
    val viaSpark = vals.toDF("h").repartition(9)
      .agg(udaf(agg, org.apache.spark.sql.Encoders.scalaLong)(col("h")))
      .head.getSeq[Long](0).toSeq
    assert(viaSpark == one.toSeq)
  }

  test("pruned semi-join equals plain semi-join on real tables") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dim = spark.read.parquet(s"$sf/part.parquet").where($"p_size" <= 5)
    val pruned = BloomJoin.prunedLeftSemi(li, $"l_partkey", dim, $"p_partkey")
      .select($"l_orderkey", $"l_linenumber").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(dim, $"l_partkey" === $"p_partkey", "left_semi")
      .select($"l_orderkey", $"l_linenumber").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pruned == plain && plain.nonEmpty)
  }

  test("mixed-width numeric keys cannot produce false negatives") {
    // raw-typed xxhash64 hashes INT and BIGINT of the same value
    // differently; keyHash's canonical string form keeps the bloom
    // prefilter aligned with the equi-join's implicit cast
    val fact = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v") // k: INT
    val dim = Seq(1L, 3L).toDF("dk") // dk: BIGINT
    val got = BloomJoin.prunedLeftSemi(fact, $"k", dim, $"dk")
      .select($"v").as[String].collect().toSet
    assert(got == Set("a", "c"))
  }

  test("probe is a codegen filter below the exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val dim = spark.read.parquet(s"$sf/part.parquet").where($"p_size" === 1)
    val df = BloomJoin.prunedLeftSemi(li, $"l_partkey", dim, $"p_partkey")
      .groupBy($"l_returnflag").agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(2000))
    // the probe must sit in a Filter directly over the fact scan,
    // not above the join
    val lines = plan.linesIterator.toSeq
    val probeLine = lines.indexWhere(_.contains("bloom_might_contain"))
    val joinLine = lines.indexWhere(_.contains("BroadcastHashJoin"))
    assert(joinLine >= 0 && probeLine > joinLine, "probe should be below the join in the plan tree")
  }
}
