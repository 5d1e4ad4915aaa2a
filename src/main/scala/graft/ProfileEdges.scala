package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B harness for the co-shipment edge build (tc1/kc1 front end):
  * old block self-join vs one-agg sorted-pair explode, interleaved in
  * ONE JVM so box drift cannot masquerade as a win (the r16 rule).
  * Times the full downstream triangleCounts on each edge frame.
  * Usage: runMain graft.ProfileEdges [sfDir] [reps] */
object ProfileEdges {
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

    def blk() = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        date_trunc("week", col("l_shipdate")).as("wk"))

    def oldEdges() = {
      val b = blk().persist()
      graft.Caches.releaseAfterAction(b)
      b.as("a").join(b.as("b"),
          col("a.sk") === col("b.sk") && col("a.wk") === col("b.wk") &&
            col("a.ok") < col("b.ok"))
        .select(col("a.ok").as("src"), col("b.ok").as("dst"))
    }

    def newEdges() = blk().groupBy(col("sk"), col("wk"))
      .agg(sort_array(collect_set(col("ok"))).as("oks"))
      .select(explode(expr(
        """flatten(transform(oks, (a, i) ->
             transform(slice(oks, i + 2, size(oks)),
               b -> struct(a AS src, b AS dst))))""")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

    def t(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime(); f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // parity check first: identical edge sets
    val o = oldEdges().distinct().count()
    val n = newEdges().distinct().count()
    println(s"[ab] edge parity: old=$o new=$n ${if (o == n) "OK" else "MISMATCH"}")

    (1 to reps).foreach { r =>
      t(s"rep$r old edges->tri") {
        graft.operators.Graphs.triangleCounts(oldEdges()).count()
      }
      t(s"rep$r new edges->tri") {
        graft.operators.Graphs.triangleCounts(newEdges()).count()
      }
    }
    spark.stop()
  }
}
