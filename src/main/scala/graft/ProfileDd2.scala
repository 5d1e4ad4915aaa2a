package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-by-stage profiler for the MinHash front end — a dev tool. */
object ProfileDd2 {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
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
      val docs = Tables.documents(spark, d)
      time(s"run$i docs count") { docs.count() }
      val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
      time(s"run$i shingleRows distinct") { sh.count() }
      val sigs = Dedup.minhashSignatures(sh, 6)
      time(s"run$i signatures") { sigs.count() }
      val cands = Dedup.minhashCandidates(sigs, 6, 2, 1000)
      time(s"run$i candidates") { cands.count() }
      time(s"run$i full dd2") {
        graft.queries.QueryCatalog.byName("dd2_minhash_lsh").run(spark, d).count()
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
