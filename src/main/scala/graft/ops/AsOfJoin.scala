package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row with
  * right.time <= left.time within the same key. Spark has no native
  * operator; the scalable formulation is union + last(ignoreNulls) over
  * a time-ordered window: one shuffle on the key, linear scan per key,
  * no range self-join blowup.
  */
object AsOfJoin {

  /** `left` and `right` share keyCol + timeCol; the right side's other
    * columns ride along and come back null when no right row precedes a
    * left row. Column sets (besides key/time) must be disjoint. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val rightOnly = right.columns.filterNot(c => c == keyCol || c == timeCol)
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows order before left rows at equal time => "<=" semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightOnly.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_side")
  }
}
