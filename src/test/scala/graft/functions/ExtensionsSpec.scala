package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase.spark
import graft.core.{Hilbert, ZOrder}

class ExtensionsSpec extends AnyFunSuite {
  import spark.implicits._

  test("hilbert xy2d/d2xy bijection and unit-step locality") {
    val n = 6
    val side = 1 << n
    val seen = new Array[Boolean](side * side)
    var prev: Option[(Int, Int)] = None
    (0L until (side.toLong * side)).foreach { d =>
      val (x, y) = Hilbert.d2xy(n, d)
      assert(Hilbert.xy2d(n, x, y) == d)
      assert(!seen(x + y * side)); seen(x + y * side) = true
      prev.foreach { case (px, py) =>
        assert(math.abs(x - px) + math.abs(y - py) == 1) // Hilbert steps are unit moves
      }
      prev = Some((x, y))
    }
  }

  test("zorder/hilbert Column functions evaluate via codegen") {
    val df = Seq((3, 5), (0, 0), (65535, 65535)).toDF("c", "r")
    val got = df.select(
      ZOrderKey.zorder($"c", $"r").as("z"),
      HilbertKey.hilbert($"c", $"r").as("h")).collect()
    assert(got(0).getLong(0) == ZOrder.interleave(3, 5))
    assert(got(0).getLong(1) == Hilbert.xy2d(16, 3, 5))
    assert(got(2).getLong(0) == ZOrder.interleave(65535, 65535))
  }

  test("SQL frontend plans the native expressions (function registry)") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("zorder", exprs => ZOrderKey(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("hilbert", exprs => HilbertKey(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    val r = spark.sql(
      "SELECT zorder(CAST(3 AS INT), CAST(5 AS INT)) AS z, hilbert(CAST(3 AS INT), CAST(5 AS INT)) AS h")
      .head()
    assert(r.getLong(0) == ZOrder.interleave(3, 5))
    assert(r.getLong(1) == Hilbert.xy2d(16, 3, 5))
    val c = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), 0.0), array(CAST(1.0 AS DOUBLE), 0.0)) AS c")
      .head().getDouble(0)
    assert(c == 1.0)
  }

  test("SQL h60/hash_bucket equal the JVM kernel and the Column API") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("h60",
      exprs => GraftExtensions.h60Expr(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("hash_bucket",
      GraftExtensions.hashBucketBuilder, "scala_udf")
    val r = spark.sql("SELECT h60('alpha') AS h, hash_bucket('alpha', 10) AS b").head()
    assert(r.getLong(0) == graft.text.TextOps.hash60("alpha"))
    assert(r.getLong(1) == graft.text.TextOps.hash60("alpha") % 10)
  }

  test("SQL frontend aggregates through the registered KMV sketch") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("kmv_distinct",
      GraftExtensions.kmvDistinctBuilder, "scala_udf")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .createOrReplaceTempView("li_ext")
    val viaSql = spark.sql(
      """SELECT l_returnflag,
        |       kmv_distinct(conv(substring(md5(cast(cast(l_partkey AS string) AS binary)), 1, 15), 16, 10), 64) AS nd
        |FROM li_ext GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaDf = spark.table("li_ext")
      .select($"l_returnflag", graft.text.TextOps.h60($"l_partkey".cast("string")).as("h"))
      .groupBy($"l_returnflag")
      .agg(graft.ops.Sketches.kmvDistinct($"h", 64).as("nd"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaDf && viaDf.nonEmpty)
  }

  test("nfc_normalize composes decomposed sequences, is idempotent and null-safe") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs(0)), "scala_udf")
    val rows = Seq(
      "a\u0301",           // a + combining acute -> U+00E1
      "\u1100\u1161",      // Hangul jamo -> precomposed syllable U+AC00
      "plain ascii",       // fast path: already NFC
      "e\u0327\u0301")        // multiple combining marks: NFC orders + composes
      .toDF("s")
    val got = rows.select(NfcNormalize.nfc($"s").as("n")).as[String].collect()
    val want = rows.as[String].collect()
      .map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want.toSeq)
    assert(got(0) == "\u00e1" && got(1) == "\uac00")
    // idempotent: normalizing the normalized output is identity
    val twice = rows.select(NfcNormalize.nfc(NfcNormalize.nfc($"s")).as("n"))
      .as[String].collect()
    assert(twice.toSeq == got.toSeq)
    // null propagates (UnaryExpression nullSafeEval contract)
    val n = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS x").head()
    assert(n.isNullAt(0))
  }
}
