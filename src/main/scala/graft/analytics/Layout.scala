package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB design point (SCALE.md):
  * bucketing to delete join shuffles, salting to break aggregation skew.
  */
object Layout {

  /** Write a table bucketed (and sorted) by join key. Subsequent equi-joins
    * between tables bucketed the same way need NO shuffle — Catalyst sees
    * matching `HashPartitioning` from the bucket spec and plans a
    * sort-merge join without Exchange on either side. This is the
    * pre-partitioned co-located join the reference could never express
    * (pandas has no layout concept). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted high-cardinality aggregation: two-level aggregate for skewed
    * group keys. Level 1 aggregates on (key, salt) — hot keys split into
    * `saltBuckets` partial groups spread over the cluster; level 2 merges
    * the partials per key. Only sum/count-shaped aggregates are
    * decomposable this way (associative merge). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltBuckets: Int): DataFrame = {
    // spark_partition_id is stable under task recomputation (same
    // lineage → same partition → same id), unlike
    // monotonically_increasing_id-derived salts which can double-count
    // rows when a map task is recomputed after a fetch failure
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id(), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(24,6)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
