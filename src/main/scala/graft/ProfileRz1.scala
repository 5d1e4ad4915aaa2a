package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the rz1 robust-z pieces — where do the
  * seconds go between the class histogram, the two prefix-scan quantile
  * passes, and the final projection. Usage: runMain graft.ProfileRz1 [sfDir] */
object ProfileRz1 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Ranks

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 2).foreach { pass =>
      println(s"---- pass $pass")
      spark.catalog.clearCache()
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
      time("li scan count")(li.count())
      val cls0 = li.groupBy(col("flag"), col("price"))
        .agg(count(lit(1)).as("__c"))
      time("cls agg (uncached count)")(cls0.count())
      val cls = cls0.persist()
      time("materialize cls")(cls.count())
      time("repartitionByRange(cls) count") {
        cls.repartitionByRange(col("flag"), col("price")).count()
      }
      time("prefixSum(cls) count") {
        Ranks.prefixSum(cls, Seq(col("flag")), Seq(col("price")),
          col("__c"), "__cum").count()
      }
      time("quantilesOfClasses med collect") {
        Ranks.quantilesOfClasses(cls, Seq("flag"), "price", "__c",
          Seq("med" -> 0.5)).collect()
      }
      val medF = Ranks.quantilesOfClasses(cls, Seq("flag"), "price", "__c",
        Seq("med" -> 0.5)).select(col("flag"), col("med"))
      val devClsF = cls.join(broadcast(medF), "flag")
        .groupBy(col("flag"), col("med"),
          abs(col("price") - col("med")).as("adev"))
        .agg(sum(col("__c")).as("__c"))
      time("stats (med+mad chain) collect") {
        Ranks.quantilesOfClasses(devClsF, Seq("flag", "med"), "adev", "__c",
          Seq("mad" -> 0.5)).collect()
      }
      time("final join only (with warm stats)") {
        val statsF = Ranks.quantilesOfClasses(devClsF, Seq("flag", "med"), "adev", "__c",
          Seq("mad" -> 0.5)).select(col("flag"), col("med"), col("mad"))
        li.join(broadcast(statsF), "flag")
          .select(col("l_orderkey"), col("l_linenumber"), col("flag"),
            round(col("price"), 6).as("price"),
            round((col("price") - col("med")) / (lit(1.4826) * col("mad")), 6)
              .as("robust_z")).count()
      }
      cls.unpersist()
      time("whole query via catalog") {
        graft.queries.QueryCatalog.byName("rz1_robust_zscore").run(spark, d).count()
      }
    }
    spark.stop()
  }
}
