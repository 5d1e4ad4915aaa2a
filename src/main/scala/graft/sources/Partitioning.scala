package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout — the data-skipping primitive
  * that makes a 100 TB table queryable: a predicate on the partition
  * column prunes whole directories at PLANNING time (the scan's
  * `PartitionFilters`, never reading a byte of the pruned partitions),
  * and a JOIN against a filtered dimension prunes them at RUNTIME via
  * dynamic partition pruning (Spark's DPP subquery — the broadcast dim's
  * key set filters the fact scan before it starts).
  *
  * This is the storage-side complement to [[Bucketing]]: bucketing
  * pre-pays the shuffle for repeated equi-joins on a high-cardinality
  * key; partitioning pre-pays the filter for repeated selective scans on
  * a LOW-cardinality key (language, date, source shard). Partition
  * columns must stay low-cardinality — one directory (and ≥1 file) per
  * value is the cost model, so a per-doc key here would be pathological.
  *
  * Both properties are asserted against executed plans in
  * PartitioningSpec.
  */
object Partitioning {

  /** Materialize `df` as parquet partitioned by `cols` (directory per
    * value combination). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Read a partitioned layout back; partition columns come from the
    * directory names (partition discovery). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
