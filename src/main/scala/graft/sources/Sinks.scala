package graft.sources

import org.apache.spark.sql.DataFrame

/** Output sinks — the DFS-write side of the reference class, shaped for
  * 100 TB reads-after-write:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning on
  *    low-cardinality columns (date, lang, label) → readers prune whole
  *    directories (`PartitionFilters` — proven in ExtensionsSpec).
  *  - [[writeBucketed]]: pre-shuffled bucket layout on a join/group key
  *    → co-located joins and aggregations with NO exchange (proven in
  *    BucketingSpec).
  *  - [[writeSorted]]: plain parquet with in-file ordering on a filter
  *    column → parquet min/max row-group statistics make point/range
  *    filters skip row groups.
  *
  * All three keep writes distributed (one file per task); never
  * coalesce(1) outside the dev harness.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    // Idempotent across JVMs: the in-memory catalog forgets the table on
    // restart but its warehouse directory survives, and saveAsTable then
    // refuses the "new" table over the existing location.
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Pre-partition on the bucket key: bucketBy alone writes one file
    // per (task × bucket) — tasks×buckets small files at scale; after
    // repartition each task holds exactly one bucket (same Murmur3 hash
    // as the bucket spec) and writes exactly one file.
    df.repartition(buckets, df(key)).write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  def writeSorted(df: DataFrame, path: String, col: String): Unit =
    df.sortWithinPartitions(col).write.mode("overwrite").parquet(path)
}
