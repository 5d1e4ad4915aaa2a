package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the shuffle you pay ONCE at write time
  * instead of on every join (the 100 TB answer for a fact table that is
  * repeatedly joined/aggregated on the same key, e.g. the expression fact
  * on `gene_id`).
  *
  * Both sides bucketed by the join key into the same bucket count join
  * with NO exchange: each task reads matching bucket files directly
  * (asserted in BucketingSpec against the executed plan).
  */
object Bucketing {

  /** Materialize `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key. */
  def cocolocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
