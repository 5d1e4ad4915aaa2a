package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for tc1 triangle counting: times edge
  * generation, orientation, and the wedge/closure joins separately.
  * Usage: runMain graft.ProfileTc [sfDir] */
object ProfileTc {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val blk = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        date_trunc("week", col("l_shipdate")).as("wk"))
      .distinct().persist()
    t("blk distinct")(println("  blk: " + blk.count()))
    val edges = blk.as("a").join(blk.as("b"),
        col("a.sk") === col("b.sk") && col("a.wk") === col("b.wk") &&
          col("a.ok") < col("b.ok"))
      .select(col("a.ok").as("src"), col("b.ok").as("dst"))
    val e = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().persist()
    t("edges distinct")(println("  e: " + e.count()))
    val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val ka = struct(col("da").as("d"), col("a").as("i"))
    val kb = struct(col("db").as("d"), col("b").as("i"))
    val eo = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(ka < kb, col("a")).otherwise(col("b")).as("u"),
        when(ka < kb, col("b")).otherwise(col("a")).as("v"),
        when(ka < kb, kb).otherwise(ka).as("vk"))
      .persist()
    t("orient (2 deg joins)")(println("  eo: " + eo.count()))
    val w = eo.as("e1")
      .join(eo.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.vk") < col("e2.vk"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    t("wedges")(println("  w: " + w.count()))
    val tri = w.join(eo.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
    t("wedges+closure")(println("  tri: " + tri.count()))
    val counts = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    t("full counts")(println("  nodes: " + counts.count()))
    spark.stop()
  }
}
