package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for the two-phase rank family (e1/de1/km1) —
  * a dev tool, not library surface. */
object ProfileE1 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    (1 to 3).foreach { i =>
      val li = Tables.lineitem(spark, d)
      time(s"run$i lineitem count") { li.count() }
      val ranged = li
        .repartitionByRange(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("__pid", spark_partition_id())
        .persist()
      time(s"run$i ranged persist+count") { ranged.count() }
      val counts = ranged.groupBy(col("l_returnflag"), col("__pid"))
        .agg(count(lit(1)).as("__cnt"))
      time(s"run$i counts") { counts.count() }
      import org.apache.spark.sql.expressions.Window
      val wLocal = Window.partitionBy(col("l_returnflag"), col("__pid"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val ranked = ranged.withColumn("__lrn", row_number().over(wLocal))
      time(s"run$i local window") { ranked.count() }
      ranged.unpersist()
      time(s"run$i full e1 query") {
        graft.queries.QueryCatalog.byName("e1_ntile_split").run(spark, d).count()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
