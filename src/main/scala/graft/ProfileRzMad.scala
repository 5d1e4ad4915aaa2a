package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Dev A/B harness for rz1's MAD pass: dev-class hash agg + quantile
  * (current) vs feeding the UN-aggregated |price−med| class rows
  * straight into the quantile prefix scan (rank-quantile selection is
  * tie-order-independent, so duplicate-value class rows change nothing
  * but the row count entering the range exchange). Interleaved in one
  * JVM. Usage: runMain graft.ProfileRzMad [sfDir] [reps] */
object ProfileRzMad {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def queryWith(aggDevCls: Boolean) = {
      val li = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
      val cls = li.groupBy(col("flag"), col("price"))
        .agg(count(lit(1)).as("__c")).persist()
      graft.Caches.releaseAfterAction(cls)
      val med = Ranks.quantilesOfClasses(cls, Seq("flag"), "price", "__c",
          Seq("med" -> 0.5))
        .select(col("flag"), col("med"))
      val joined = cls.join(broadcast(med), "flag")
      val devCls =
        if (aggDevCls)
          joined.groupBy(col("flag"), col("med"),
              abs(col("price") - col("med")).as("adev"))
            .agg(sum(col("__c")).as("__c"))
        else
          joined.select(col("flag"), col("med"),
            abs(col("price") - col("med")).as("adev"), col("__c"))
      val stats = Ranks.quantilesOfClasses(devCls, Seq("flag", "med"),
          "adev", "__c", Seq("mad" -> 0.5))
        .select(col("flag"), col("med"), col("mad"))
      li.join(broadcast(stats), "flag")
        .select(col("l_orderkey"), col("l_linenumber"), col("flag"),
          round(col("price"), 6).as("price"),
          round((col("price") - col("med")) / (lit(1.4826) * col("mad")), 6)
            .as("robust_z"))
    }

    // parity: identical (flag, med, mad) stats, identical output hash
    val a = queryWith(aggDevCls = true).agg(
      sum(hash(col("l_orderkey"), col("l_linenumber"), col("flag"),
        col("price"), col("robust_z")).cast("long")).as("h")).collect()(0).getLong(0)
    val b = queryWith(aggDevCls = false).agg(
      sum(hash(col("l_orderkey"), col("l_linenumber"), col("flag"),
        col("price"), col("robust_z")).cast("long")).as("h")).collect()(0).getLong(0)
    println(s"[ab] result parity: agg=$a raw=$b ${if (a == b) "OK" else "MISMATCH"}")

    def t(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime(); f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to reps).foreach { r =>
      t(s"rep$r agg-devcls (current)")(queryWith(true).count())
      t(s"rep$r raw-devcls (candidate)")(queryWith(false).count())
    }
    spark.stop()
  }
}
