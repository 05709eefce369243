package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed co-located joins (SURVEY "co-locate joins via bucketing").
  *
  * At 100 TB, the dominant cost of a fact⋈fact join is the shuffle. When
  * both sides are written bucketed (and sorted) on the join key with the
  * same bucket count, Spark's sort-merge join reads bucket i of each side
  * on the same task — NO exchange on either side. This is the standing
  * answer for repeated big-big joins (e.g. lineitem⋈orders every run):
  * pay the partitioned write once, skip the shuffle every query after.
  *
  * Local note: bucketed tables go through the session catalog
  * (`saveAsTable` into spark-warehouse); BucketingSpec asserts the
  * joined plan contains no ShuffleExchange.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on `key` — shuffle-free when
    * bucket counts match. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession, left: String,
      right: String, key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** Hive-style partitioned layout (out4): the OTHER physical-layout
    * lever besides bucketing — a predicate on the partition column
    * prunes whole directories at PLANNING time, before a single row is
    * read. At 100 TB this is the difference between scanning one day
    * and scanning three years; every date-ranged query in the catalog
    * assumes the production tables are laid out this way.
    * BucketingSpec/ScaleSpec pins that a day-equality filter reaches
    * the scan as a partition filter and selects exactly one partition
    * directory. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
