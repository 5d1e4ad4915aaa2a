package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the bloom-contamination pieces vs the
  * exact scan. Usage: runMain graft.ProfileBf1 [sfDir] */
object ProfileBf1 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, TextFunctions}
    graft.expressions.GraftFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"---- round $round")
      spark.catalog.clearCache()
      val docs = Tables.documents(spark, d)
      val trainFlag = substring(col("source"), 4, 10).cast("int") < 10
      val sh = docs.select(col("doc_id"), trainFlag.as("is_train"),
          explode(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("sh"))
        .distinct().persist()
      time("materialize sh")(sh.count())
      val trainSh = sh.filter(col("is_train"))
        .groupBy("sh").agg(count(lit(1)).as("__ndocs"))
        .filter(col("__ndocs") <= 1000).select("sh").persist()
      time("materialize trainSh")(trainSh.count())
      val bytes = time("bloomOf")(
        Dedup.bloomOf(trainSh, "sh", 1L << 17, 0.01))
      val test = sh.filter(!col("is_train")).select("doc_id", "sh")
      time("totals")(test.groupBy("doc_id").agg(count(lit(1))).count())
      time("probe+semijoin+agg") {
        test.filter(call_function("bloom_might_contain", lit(bytes), col("sh")))
          .join(trainSh, Seq("sh"), "leftsemi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared")).count()
      }
      time("exact semijoin+agg (no probe)") {
        test.join(trainSh, Seq("sh"), "leftsemi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared")).count()
      }
      sh.unpersist(); trainSh.unpersist()
    }
    spark.stop()
  }
}
