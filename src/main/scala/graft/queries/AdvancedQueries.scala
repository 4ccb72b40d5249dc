package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Fixtures._

/** SQL breadth the reference never had but Catalyst gives free
  * (SURVEY §2.6 "no grouping sets / cube / rollup ... Catalyst provides
  * them"): rollup/cube, correlated + scalar subqueries, ranking window
  * family. All oracle-checked. */
object AdvancedQueries {
  type Q = (SparkSession, String) => DataFrame

  /** ROLLUP over (returnflag, linestatus) with grouping ids. */
  val rollup: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))

  val rollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS n,
      |       GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over (orderstatus, orderpriority). */
  val cube: Q = (s, dir) =>
    table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(dec2(col("o_totalprice"))).as("total"))

  val cubeSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |       ${dsumSql(dec2Sql("o_totalprice"))} AS total
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Correlated EXISTS (TPC-H Q4 shape): orders with at least one
    * late lineitem. */
  val correlatedExists: Q = (s, dir) => {
    val o = table(s, dir, "orders")
    val li = table(s, dir, "lineitem")
      .where(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val correlatedExistsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |GROUP BY 1""".stripMargin

  /** Scalar subquery (TPC-H Q17 shape): lineitems below 50% of their
    * part's average quantity. Avg computed as exact sum/count. */
  val scalarSubquery: Q = (s, dir) => {
    val li = table(s, dir, "lineitem")
    val avgQ = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    li.join(avgQ, col("l_partkey") === col("pk"))
      .where(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(count(lit(1)).as("n_below"),
        sum(col("l_quantity")).cast("double").as("qty_below"))
  }

  val scalarSubquerySql: String =
    """SELECT COUNT(*) AS n_below, CAST(SUM(l_quantity) AS DOUBLE) AS qty_below
      |FROM lineitem l
      |WHERE l_quantity < (SELECT 0.5 * SUM(l2.l_quantity) / COUNT(*)
      |                    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** Ranking window family: rank / dense_rank / lag / lead / ntile over
    * suppliers' revenue. Exact decimal revenue keeps ordering
    * deterministic; unique key tie-break. */
  val rankingWindows: Q = (s, dir) => {
    val rev = table(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(dsum(revenue).as("revenue"))
    val w = Window.orderBy(col("revenue").desc, col("l_suppkey"))
    rev.select(col("l_suppkey"), col("revenue"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      coalesce(lag(col("l_suppkey"), 1).over(w), lit(-1L)).as("prev_supp"),
      coalesce(lead(col("l_suppkey"), 1).over(w), lit(-1L)).as("next_supp"))
  }

  val rankingWindowsSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, ${dsumSql(revenueSql)} AS revenue
       |  FROM lineitem GROUP BY 1)
       |SELECT l_suppkey, revenue,
       |       CAST(RANK() OVER w AS INT) AS rnk,
       |       CAST(DENSE_RANK() OVER w AS INT) AS drnk,
       |       CAST(NTILE(4) OVER w AS INT) AS quartile,
       |       COALESCE(LAG(l_suppkey, 1) OVER w, -1) AS prev_supp,
       |       COALESCE(LEAD(l_suppkey, 1) OVER w, -1) AS next_supp
       |FROM rev
       |WINDOW w AS (ORDER BY revenue DESC, l_suppkey)""".stripMargin

  /** Conditional aggregation / pivot shape: revenue per returnflag
    * spread to columns. */
  val pivot: Q = (s, dir) =>
    table(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(revenue))
      .na.fill(0.0)

  val pivotSql: String =
    s"""SELECT l_linestatus,
       |  COALESCE(${dsumSql(s"CASE WHEN l_returnflag = 'A' THEN $revenueSql END")}, 0.0) AS A,
       |  COALESCE(${dsumSql(s"CASE WHEN l_returnflag = 'N' THEN $revenueSql END")}, 0.0) AS N,
       |  COALESCE(${dsumSql(s"CASE WHEN l_returnflag = 'R' THEN $revenueSql END")}, 0.0) AS R
       |FROM lineitem GROUP BY 1""".stripMargin

  /** As-of join (an operator Spark lacks natively; graft.ops.AsOfJoin
    * is union + last-over-window — one shuffle, no range blowup): every
    * click event picks up the latest view at-or-before it per user.
    * Oracle: DuckDB's native ASOF LEFT JOIN. */
  val asofJoin: Q = (s, dir) => {
    val ev = events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value").as("click_value"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"))
    graft.ops.AsOfJoin.asof(clicks, views, "user_id", "ts")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("click_value"), col("view_value"))
  }

  val asofJoinSql: String =
    s"""WITH $eventsCte,
       |clicks AS (SELECT user_id, ts, event_id, value AS click_value
       |           FROM evts WHERE event_type = 'click'),
       |views AS (SELECT user_id, ts, value AS view_value
       |          FROM evts WHERE event_type = 'view')
       |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       |       c.click_value, v.view_value
       |FROM clicks c ASOF LEFT JOIN views v
       |  ON c.user_id = v.user_id AND v.ts <= c.ts""".stripMargin

  val all: Map[String, (Q, Option[String])] = Map(
    "a_asof_join" -> (asofJoin, Some(asofJoinSql)),
    "a_rollup" -> (rollup, Some(rollupSql)),
    "a_cube" -> (cube, Some(cubeSql)),
    "a_exists_agg" -> (correlatedExists, Some(correlatedExistsSql)),
    "a_scalar_subquery" -> (scalarSubquery, Some(scalarSubquerySql)),
    "a_ranking_windows" -> (rankingWindows, Some(rankingWindowsSql)),
    "a_pivot" -> (pivot, Some(pivotSql)),
  )
}
