package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided star-schema parquet tables
  * (see /root/repo/TESTDATA.md). Every query receives the sf directory at
  * call time, so the same query runs at any scale factor.
  *
  * Scale note: `spark.read.parquet` gives Catalyst a V1 FileScan with
  * filter/column pushdown; at 100 TB the same call over a partitioned
  * table root gets partition pruning for free. Nothing here collects
  * to the driver.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the full catalog is reachable
    * through `spark.sql(...)` as well as the DataFrame API. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Older driver-generated events.parquet carried TIMESTAMP(NANOS), which
    // vanilla Spark 4 rejects outright; the legacy conf reads those as
    // epoch-nanos LongType instead of failing the scan. Current testdata
    // writes timestamp[us] (TIMESTAMP_NTZ to Spark) — the conf is then a
    // no-op, kept so both generations of data load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // [[eventTs]]'s NTZ→TZ cast is instant-correct ONLY under a UTC
    // session zone. Every entry point in this repo pins it already; set
    // it here too so an external caller with a zoned session cannot
    // silently shift every event instant by its zone offset.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** SQL for `events.ts` (TIMESTAMP_NTZ, µs precision) as epoch
    * microseconds — timezone-INdependent: the NTZ wall time is diffed
    * against the epoch instead of cast through the session zone. DuckDB
    * oracle twin: `epoch_us(ts)`. */
  val eventTsMicrosSql: String =
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"

  /** `events.ts` as epoch-µs BIGINT (see [[eventTsMicrosSql]]). */
  def eventTsMicros: Column = expr(eventTsMicrosSql)

  /** `events.ts` as TimestampType for the streaming/window paths (watermark,
    * `window()`, typed Event encoders use java.sql.Timestamp). The NTZ→TZ
    * cast reads the wall time in the session zone — [[load]] pins
    * `spark.sql.session.timeZone=UTC` (and every session builder in this
    * repo does too), making it the identity on instants and keeping
    * `unix_micros`/`unix_timestamp` parity with the oracle's
    * `epoch_us`/`epoch`. */
  def eventTs: Column = expr("cast(ts as timestamp)")
}
