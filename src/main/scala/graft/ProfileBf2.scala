package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileBf2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val tf = substring(col("source"), 4, 10).cast("int") < 10
    (1 to 2).foreach { round =>
      println(s"---- round $round")
      spark.catalog.clearCache(); System.gc()
      time("ct1 total")(graft.operators.Dedup.contamination(
        Tables.documents(spark, d), "doc_id", "text", tf, 3, 1000).count())
      spark.catalog.clearCache(); System.gc()
      time("bf1 total")(graft.operators.Dedup.contaminationBloom(
        Tables.documents(spark, d), "doc_id", "text", tf, 3, 1000,
        expectedItems = 1L << 17, fpp = 0.01).count())
      spark.catalog.clearCache(); System.gc()
      // the auto-size path: one extra rdd.count() job over the persisted
      // dictionary — its cost vs the explicit-size call above is the
      // number the contaminationBloom scaladoc quotes
      time("bf1 auto-size")(graft.operators.Dedup.contaminationBloom(
        Tables.documents(spark, d), "doc_id", "text", tf, 3, 1000,
        fpp = 0.01).count())
    }
    spark.stop()
  }
}
