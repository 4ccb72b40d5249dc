package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — pre-shuffling ONCE at write time.
  *
  * At 100 TB the dominant cost of `fact JOIN fact` is the exchange of
  * both sides on the join key, paid on EVERY query. Bucketing pays it
  * once: both tables are written hash-partitioned into the same number
  * of buckets on the key, and any equi-join on that key becomes a
  * per-bucket sort-merge with ZERO Exchange nodes — Catalyst proves
  * the co-partitioning from the table metadata (HashPartitioning(key,
  * n) on both sides) and drops the shuffles. Sorting within buckets
  * additionally lets the merge skip its sort when each bucket is one
  * file. This is the warehouse counterpart of the catalog's
  * zorder-sorted layout: organize data once, answer many queries
  * cheaply. BucketingSpec asserts the shuffle-free plan and result
  * equality against the plain join.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. The
    * bucket count is a layout contract: joins co-locate only between
    * tables bucketed on the same key into the same count. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two same-bucketed tables shuffle-free. The merge hint
    * pins sort-merge (a broadcastable side would otherwise hide the
    * co-location proof); with matching bucketing on `key` the planner
    * emits no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right).hint("merge"), key)
}
