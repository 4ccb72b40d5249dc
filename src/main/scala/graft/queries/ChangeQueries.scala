package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Raster
import Fixtures._

/** The reference's core mission — land-use *update detection*: compare
  * a layer across two epochs and surface changed cells (the K2 upsert +
  * NDVI-delta workflow, WorkflowExample.scala:26-175, SpaceTimeKey time
  * axis §1.1). Epochs here = lineitem split by ship date. */
object ChangeQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Cutoff that splits lineitem roughly in half (seed-42 data spans
    * 1992-1998). */
  private val cutoff = "1995-06-01"

  private def epochPixels(s: SparkSession, dir: String, before: Boolean): DataFrame = {
    val li = table(s, dir, "lineitem")
    val f = if (before) col("l_shipdate") < lit(cutoff).cast("timestamp")
    else col("l_shipdate") >= lit(cutoff).cast("timestamp")
    li.where(f).groupBy(
      (col("l_orderkey") % 4).cast("int").as("tile_col"),
      (col("l_suppkey") % 4).cast("int").as("tile_row"),
      (col("l_partkey") % TS).cast("int").as("px"),
      (col("l_linenumber") % TS).cast("int").as("py"))
      .agg(sum(col("l_quantity")).cast("double").as("v"))
  }

  private def epochCteSql(alias: String, op: String): String =
    s"""$alias AS (
       |  SELECT CAST(l_orderkey % 4 AS INT) AS tile_col,
       |         CAST(l_suppkey % 4 AS INT) AS tile_row,
       |         CAST(l_partkey % $TS AS INT) AS px,
       |         CAST(l_linenumber % $TS AS INT) AS py,
       |         CAST(SUM(l_quantity) AS DOUBLE) AS v
       |  FROM lineitem WHERE l_shipdate $op TIMESTAMP '$cutoff 00:00:00'
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** Per-cell epoch pair (v1, v2) through the real tile machinery
    * (assemble both epochs, full-outer tile join, cell zip) — the shared
    * core of [[changeDetect]] and [[transitionMatrix]]. Cells absent in
    * BOTH epochs are dropped; absent-in-one stays as NaN. */
  private def cellPairs(s: SparkSession, dir: String): DataFrame = {
    val t1 = Raster.assemble(epochPixels(s, dir, before = true), TS, TS)
    val t2 = Raster.assemble(epochPixels(s, dir, before = false), TS, TS)
    val joined = t1.withColumnRenamed("cells", "c1")
      .join(t2.withColumnRenamed("cells", "c2"), Seq("tile_col", "tile_row"), "full_outer")
    joined.select(col("tile_col"), col("tile_row"),
      zip_with(
        coalesce(col("c1"), array_repeat(lit(Double.NaN), TS * TS)),
        coalesce(col("c2"), array_repeat(lit(Double.NaN), TS * TS)),
        (a, b) => struct(a.as("v1"), b.as("v2"))).as("pairs"))
      .select(col("tile_col"), col("tile_row"), posexplode(col("pairs")).as(Seq("i", "p")))
      .select(col("tile_col"), col("tile_row"),
        (col("i") % TS).cast("int").as("px"),
        (col("i") / TS).cast("int").as("py"),
        col("p.v1"), col("p.v2"))
      .where(not(isnan(col("v1")) && isnan(col("v2"))))
  }

  /** Change detection: per-cell delta between epochs over the full-outer
    * cell space; change classes: appeared / disappeared / changed /
    * stable. This is J6 (merge join) + P8 cell algebra with real
    * temporal semantics. */
  val changeDetect: Q = (s, dir) =>
    cellPairs(s, dir)
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"),
        when(isnan(col("v1")), lit("appeared"))
          .when(isnan(col("v2")), lit("disappeared"))
          .when(col("v1") === col("v2"), lit("stable"))
          .otherwise(lit("changed")).as("change"),
        when(isnan(col("v1")) || isnan(col("v2")), lit(0.0))
          .otherwise(col("v2") - col("v1")).as("delta"))

  val changeDetectSql: String =
    s"""WITH ${epochCteSql("e1", "<")},
       |${epochCteSql("e2", ">=")}
       |SELECT COALESCE(e1.tile_col, e2.tile_col) AS tile_col,
       |       COALESCE(e1.tile_row, e2.tile_row) AS tile_row,
       |       COALESCE(e1.px, e2.px) AS px,
       |       COALESCE(e1.py, e2.py) AS py,
       |       CASE WHEN e1.v IS NULL THEN 'appeared'
       |            WHEN e2.v IS NULL THEN 'disappeared'
       |            WHEN e1.v = e2.v THEN 'stable'
       |            ELSE 'changed' END AS change,
       |       CASE WHEN e1.v IS NULL OR e2.v IS NULL THEN 0.0
       |            ELSE e2.v - e1.v END AS delta
       |FROM e1 FULL OUTER JOIN e2
       |  ON e1.tile_col = e2.tile_col AND e1.tile_row = e2.tile_row
       | AND e1.px = e2.px AND e1.py = e2.py""".stripMargin

  /** Land-use TRANSITION MATRIX — the classic change-analysis product a
    * land-use monitoring pipeline reports (the reference's update-
    * detection mission, WorkflowExample.scala:26-175, stops at per-cell
    * deltas; the cross-tab is what an analyst reads): classify each
    * epoch's cell (class = value mod 8, -1 = no coverage), cross-
    * tabulate over the full-outer cell space, count cells and net value
    * change per (from, to) pair. One groupBy over [[cellPairs]] —
    * output cardinality is classes², so the final aggregation is a
    * broadcast-sized reduce no matter the raster size. */
  val transitionMatrix: Q = (s, dir) =>
    cellPairs(s, dir)
      .groupBy(
        when(isnan(col("v1")), lit(-1L)).otherwise(col("v1").cast("long") % 8).as("cls_from"),
        when(isnan(col("v2")), lit(-1L)).otherwise(col("v2").cast("long") % 8).as("cls_to"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(when(isnan(col("v1")) || isnan(col("v2")), 0L)
          .otherwise((col("v2") - col("v1")).cast("long"))).as("net_delta"))

  val transitionMatrixSql: String =
    s"""WITH ${epochCteSql("e1", "<")},
       |${epochCteSql("e2", ">=")}
       |SELECT COALESCE(CAST(e1.v AS BIGINT) % 8, -1) AS cls_from,
       |       COALESCE(CAST(e2.v AS BIGINT) % 8, -1) AS cls_to,
       |       COUNT(*) AS n_cells,
       |       CAST(SUM(CASE WHEN e1.v IS NULL OR e2.v IS NULL THEN 0
       |                     ELSE CAST(e2.v - e1.v AS BIGINT) END) AS BIGINT) AS net_delta
       |FROM e1 FULL OUTER JOIN e2
       |  ON e1.tile_col = e2.tile_col AND e1.tile_row = e2.tile_row
       | AND e1.px = e2.px AND e1.py = e2.py
       |GROUP BY 1, 2""".stripMargin

  /** Per-pixel TEMPORAL TREND — exact OLS slope of the pixel's value
    * over its monthly time series (the remote-sensing greening/browning
    * trend raster; the reference's SpaceTimeKey time axis §1.1 indexes
    * epochs but never regresses over them). Month index and per-month
    * sums are integers, so all five regression moments are exact
    * BIGINTs; the slope is ONE double division — bit-portable. Two
    * pixel-keyed aggregations, the second a near-free partial agg on a
    * subset of the first's key. */
  val pixelTrend: Q = (s, dir) => {
    val pm = table(s, dir, "lineitem").groupBy(
      (col("l_orderkey") % 4).cast("int").as("tile_col"),
      (col("l_suppkey") % 4).cast("int").as("tile_row"),
      (col("l_partkey") % TS).cast("int").as("px"),
      (col("l_linenumber") % TS).cast("int").as("py"),
      ((year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1).cast("long").as("t"))
      .agg(sum(col("l_quantity")).cast("long").as("y"))
    pm.groupBy(col("tile_col"), col("tile_row"), col("px"), col("py"))
      .agg(
        count(lit(1)).as("n_epochs"),
        sum(col("t")).as("st"), sum(col("y")).as("sy"),
        sum(col("t") * col("t")).as("stt"), sum(col("t") * col("y")).as("sty"))
      .where(col("n_epochs") >= 2)
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"), col("n_epochs"),
        ((col("n_epochs") * col("sty") - col("st") * col("sy")).cast("double")
          / (col("n_epochs") * col("stt") - col("st") * col("st")).cast("double")).as("slope"))
  }

  val pixelTrendSql: String =
    s"""WITH pm AS (
       |  SELECT CAST(l_orderkey % 4 AS INT) AS tile_col,
       |         CAST(l_suppkey % 4 AS INT) AS tile_row,
       |         CAST(l_partkey % $TS AS INT) AS px,
       |         CAST(l_linenumber % $TS AS INT) AS py,
       |         CAST((year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1 AS BIGINT) AS t,
       |         CAST(SUM(l_quantity) AS BIGINT) AS y
       |  FROM lineitem GROUP BY 1, 2, 3, 4, 5),
       |g AS (
       |  SELECT tile_col, tile_row, px, py, COUNT(*) AS n_epochs,
       |         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy,
       |         CAST(SUM(t * t) AS BIGINT) AS stt, CAST(SUM(t * y) AS BIGINT) AS sty
       |  FROM pm GROUP BY 1, 2, 3, 4)
       |SELECT tile_col, tile_row, px, py, n_epochs,
       |       CAST(n_epochs * sty - st * sy AS DOUBLE)
       |         / CAST(n_epochs * stt - st * st AS DOUBLE) AS slope
       |FROM g WHERE n_epochs >= 2""".stripMargin

  /** Space-time layer (SpaceTimeKey §1.1): tiles keyed additionally by
    * month; per-key cell count + exact sums — the temporal axis the
    * reference indexes with Hilbert curves but never aggregates over
    * (WorkflowExample.scala:27 TODO). We do: per-month layer statistics. */
  val spaceTimeStats: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        (col("l_orderkey") % 4).cast("int").as("tile_col"),
        (col("l_suppkey") % 4).cast("int").as("tile_row"))
      .agg(count(lit(1)).as("n_px"), sum(col("l_quantity")).cast("double").as("sum_v"))

  val spaceTimeStatsSql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS month,
      |       CAST(l_orderkey % 4 AS INT) AS tile_col,
      |       CAST(l_suppkey % 4 AS INT) AS tile_row,
      |       COUNT(*) AS n_px, CAST(SUM(l_quantity) AS DOUBLE) AS sum_v
      |FROM lineitem GROUP BY 1, 2, 3""".stripMargin

  // Two-decimal harmonic basis in integer hundredths (cos/sin of the 12
  // calendar-month angles): LITERALS shared by both engines, the
  // Centroids determinism pattern — basis QUALITY is irrelevant to what
  // the gate proves (the per-pixel seasonal-fit plan and exact normal-
  // equation arithmetic), and integer hundredths keep every Gram/
  // moment sum an exact long.
  private val CosQ: Seq[Int] =
    (0 until 12).map(m => math.rint(math.cos(2 * math.Pi * m / 12) * 100).toInt)
  private val SinQ: Seq[Int] =
    (0 until 12).map(m => math.rint(math.sin(2 * math.Pi * m / 12) * 100).toInt)

  /** Per-pixel HARMONIC (seasonal) fit — the remote-sensing phenology
    * product beside [[pixelTrend]]'s linear trend: regress each pixel's
    * calendar-month totals on [1, cos(2πm/12), sin(2πm/12)] and report
    * the seasonal amplitude² (b²+c²), the "does this pixel breathe with
    * the seasons" raster. All nine regression moments are exact longs
    * (integer y, integer-hundredth basis), the 3×3 normal equations are
    * solved by Cramer determinants in long arithmetic, and each
    * coefficient is ONE double division — bit-portable like
    * x_pixel_trend. One pixel-keyed aggregation pair, no joins. */
  val harmonicFit: Q = (s, dir) => {
    val pm = table(s, dir, "lineitem").groupBy(
      (col("l_orderkey") % 4).cast("int").as("tile_col"),
      (col("l_suppkey") % 4).cast("int").as("tile_row"),
      (col("l_partkey") % TS).cast("int").as("px"),
      (col("l_linenumber") % TS).cast("int").as("py"),
      (month(col("l_shipdate")) - 1).cast("int").as("m"))
      .agg(sum(col("l_quantity")).cast("long").as("y"))
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"), col("y"),
        element_at(typedLit(CosQ), col("m") + 1).cast("long").as("u"),
        element_at(typedLit(SinQ), col("m") + 1).cast("long").as("w"))
    val g = pm.groupBy(col("tile_col"), col("tile_row"), col("px"), col("py"))
      .agg(count(lit(1)).as("n"),
        sum(col("u")).as("su"), sum(col("w")).as("sw"),
        sum(col("u") * col("u")).as("suu"), sum(col("w") * col("w")).as("sww"),
        sum(col("u") * col("w")).as("suw"),
        sum(col("y")).as("sy"), sum(col("u") * col("y")).as("suy"),
        sum(col("w") * col("y")).as("swy"))
      .where(col("n") >= 3)
      .select(col("tile_col"), col("tile_row"), col("px"), col("py"), col("n"),
        (col("n") * (col("suu") * col("sww") - col("suw") * col("suw"))
          - col("su") * (col("su") * col("sww") - col("suw") * col("sw"))
          + col("sw") * (col("su") * col("suw") - col("suu") * col("sw"))).as("d"),
        (col("sy") * (col("suu") * col("sww") - col("suw") * col("suw"))
          - col("su") * (col("suy") * col("sww") - col("suw") * col("swy"))
          + col("sw") * (col("suy") * col("suw") - col("suu") * col("swy"))).as("da"),
        (col("n") * (col("suy") * col("sww") - col("suw") * col("swy"))
          - col("sy") * (col("su") * col("sww") - col("suw") * col("sw"))
          + col("sw") * (col("su") * col("swy") - col("suy") * col("sw"))).as("db"),
        (col("n") * (col("suu") * col("swy") - col("suy") * col("suw"))
          - col("su") * (col("su") * col("swy") - col("suy") * col("sw"))
          + col("sy") * (col("su") * col("suw") - col("suu") * col("sw"))).as("dc"))
      .where(col("d") =!= 0L)
    g.select(col("tile_col"), col("tile_row"), col("px"), col("py"),
        col("n").as("n_months"),
        (col("da").cast("double") / col("d").cast("double")).as("a_mean"),
        (lit(100.0) * (col("db").cast("double") / col("d").cast("double"))).as("b_cos"),
        (lit(100.0) * (col("dc").cast("double") / col("d").cast("double"))).as("c_sin"))
      .withColumn("amp2",
        col("b_cos") * col("b_cos") + col("c_sin") * col("c_sin"))
  }

  val harmonicFitSql: String = {
    val cosList = CosQ.mkString(", ")
    val sinList = SinQ.mkString(", ")
    s"""WITH pm AS (
       |  SELECT CAST(l_orderkey % 4 AS INT) AS tile_col,
       |         CAST(l_suppkey % 4 AS INT) AS tile_row,
       |         CAST(l_partkey % $TS AS INT) AS px,
       |         CAST(l_linenumber % $TS AS INT) AS py,
       |         CAST(month(l_shipdate) - 1 AS INT) AS m,
       |         CAST(SUM(l_quantity) AS BIGINT) AS y
       |  FROM lineitem GROUP BY 1, 2, 3, 4, 5),
       |uw AS (
       |  SELECT tile_col, tile_row, px, py, y,
       |         CAST(list_extract(list_value($cosList), m + 1) AS BIGINT) AS u,
       |         CAST(list_extract(list_value($sinList), m + 1) AS BIGINT) AS w
       |  FROM pm),
       |g AS (
       |  SELECT tile_col, tile_row, px, py, COUNT(*) AS n,
       |         CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(w) AS BIGINT) AS sw,
       |         CAST(SUM(u * u) AS BIGINT) AS suu, CAST(SUM(w * w) AS BIGINT) AS sww,
       |         CAST(SUM(u * w) AS BIGINT) AS suw,
       |         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(u * y) AS BIGINT) AS suy,
       |         CAST(SUM(w * y) AS BIGINT) AS swy
       |  FROM uw GROUP BY 1, 2, 3, 4),
       |det AS (
       |  SELECT tile_col, tile_row, px, py, n,
       |         n * (suu * sww - suw * suw) - su * (su * sww - suw * sw)
       |           + sw * (su * suw - suu * sw) AS d,
       |         sy * (suu * sww - suw * suw) - su * (suy * sww - suw * swy)
       |           + sw * (suy * suw - suu * swy) AS da,
       |         n * (suy * sww - suw * swy) - sy * (su * sww - suw * sw)
       |           + sw * (su * swy - suy * sw) AS db,
       |         n * (suu * swy - suy * suw) - su * (su * swy - suy * sw)
       |           + sy * (su * suw - suu * sw) AS dc
       |  FROM g WHERE n >= 3)
       |SELECT tile_col, tile_row, px, py, n AS n_months,
       |       CAST(da AS DOUBLE) / CAST(d AS DOUBLE) AS a_mean,
       |       100.0 * (CAST(db AS DOUBLE) / CAST(d AS DOUBLE)) AS b_cos,
       |       100.0 * (CAST(dc AS DOUBLE) / CAST(d AS DOUBLE)) AS c_sin,
       |       (100.0 * (CAST(db AS DOUBLE) / CAST(d AS DOUBLE)))
       |         * (100.0 * (CAST(db AS DOUBLE) / CAST(d AS DOUBLE)))
       |       + (100.0 * (CAST(dc AS DOUBLE) / CAST(d AS DOUBLE)))
       |         * (100.0 * (CAST(dc AS DOUBLE) / CAST(d AS DOUBLE))) AS amp2
       |FROM det WHERE d <> 0""".stripMargin
  }

  val all: Map[String, (Q, Option[String])] = Map(
    "x_harmonic_fit" -> (harmonicFit, Some(harmonicFitSql)),
    "x_change_detect" -> (changeDetect, Some(changeDetectSql)),
    "x_transition_matrix" -> (transitionMatrix, Some(transitionMatrixSql)),
    "x_pixel_trend" -> (pixelTrend, Some(pixelTrendSql)),
    "x_spacetime_stats" -> (spaceTimeStats, Some(spaceTimeStatsSql)),
  )
}
