package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B harness for the co-shipment edge build (tc1/kc1 front end),
  * interleaved in ONE JVM so box drift cannot masquerade as a win (the
  * r16 rule). Arms: r15 block self-join, r16 one-agg + single in-row
  * O(n²) pair-array explode, r17 one-agg + nested O(n)-buffer explode.
  * Times the full downstream triangleCounts on each edge frame; checks
  * exact edge-set parity (both-direction exceptAll) first.
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

    // r16 form: one agg, whole pair array built in ONE row buffer
    def r16Edges() = blk().groupBy(col("sk"), col("wk"))
      .agg(sort_array(collect_set(col("ok"))).as("oks"))
      .select(explode(expr(
        """flatten(transform(oks, (a, i) ->
             transform(slice(oks, i + 2, size(oks)),
               b -> struct(a AS src, b AS dst))))""")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

    // r17 form: nested Generates, O(n) per-row buffers
    def r17Edges() = blk()
      .filter(col("sk").isNotNull && col("wk").isNotNull)
      .groupBy(col("sk"), col("wk"))
      .agg(sort_array(collect_set(col("ok"))).as("oks"))
      .select(col("oks"), posexplode(col("oks")).as(Seq("i", "src")))
      .select(col("src"),
        explode(slice(col("oks"), col("i") + lit(2), size(col("oks"))))
          .as("dst"))

    def t(label: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200); System.gc()
      val t0 = System.nanoTime(); f
      println(f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // parity first: exact SET equality across all three forms
    val o = oldEdges().distinct().count()
    val a = r16Edges().distinct().count()
    val n = r17Edges().distinct().count()
    val d1 = r17Edges().exceptAll(r16Edges()).count()
    val d2 = r16Edges().exceptAll(r17Edges()).count()
    println(s"[ab] edge parity: selfjoin=$o r16=$a r17=$n " +
      s"exceptAll r17-r16=$d1 r16-r17=$d2 " +
      (if (o == a && a == n && d1 == 0 && d2 == 0) "OK" else "MISMATCH"))

    (1 to reps).foreach { r =>
      t(s"rep$r r16 edges->tri") {
        graft.operators.Graphs.triangleCounts(r16Edges()).count()
      }
      t(s"rep$r r17 edges->tri") {
        graft.operators.Graphs.triangleCounts(r17Edges()).count()
      }
    }
    spark.stop()
  }
}
