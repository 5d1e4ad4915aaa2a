package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingest — the arrival format of most
  * raw training-data corpora; an extension beside the reference's
  * delimited-file scans (A5, CsvIO).
  *
  * Scale stance: schema is ALWAYS supplied explicitly — schema inference
  * reads the whole input twice, a non-starter at 100 TB. Malformed lines
  * are quarantined, not dropped and not fatal: PERMISSIVE mode keeps the
  * raw line in a corrupt-record column so a bad shard surfaces as data
  * (counted, inspectable, reprocessable) instead of a failed job. JSONL
  * splits by line, so a large file still fans out across tasks.
  */
object JsonlIO {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an enforced schema; malformed lines land in
    * `_corrupt_record` with every schema column NULL. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a permissive read into (clean rows without the corrupt column,
    * quarantined raw lines). Callers count/inspect the second frame.
    * The parsed scan is persisted: both sides filter it, and Spark
    * refuses corrupt-column-only queries against a raw file scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    *
    * CALLER-MANAGED cache (the one exception to the Caches
    * release-after-action contract): the quarantine frame is only legal
    * against the cached intermediate, and the two returned frames are
    * consumed by separate actions — unpersist the clean frame (or
    * `Caches.clearCaches`) once both sides are consumed. */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persist()
    val clean = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (clean, bad)
  }

  /** JSONL export of any frame (presentation edge; one file per task —
    * no coalesce(1), writers scale with the data). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
