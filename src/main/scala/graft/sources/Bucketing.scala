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

  /** Materialize `df` as an EXTERNAL bucketed table — data under `path`,
    * metadata in the session catalog. The external split is what makes
    * bucketing usable from a write-once layout: the data files (with
    * their bucket-id file names) outlive the session, and a later
    * session re-attaches them with [[registerBucketed]] instead of
    * re-paying the bucketing shuffle. */
  def writeBucketedExternal(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Re-attach an existing bucketed layout as a catalog table (DDL with
    * an explicit bucket spec over the files' location) — the cross-JVM
    * half of [[writeBucketedExternal]]: Spark trusts the declared
    * CLUSTERED BY and reads each task's matching bucket files with no
    * exchange, exactly as if the table had been written this session.
    * `schema` is DDL column syntax (`"k BIGINT, v DOUBLE"`) — bucket
    * metadata lives in the catalog, not the parquet footers, so it must
    * be declared. */
  def registerBucketed(spark: SparkSession, table: String, schema: String,
      key: String, buckets: Int, path: String): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table ($schema) USING parquet
          CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
          LOCATION '$path'""")
}
