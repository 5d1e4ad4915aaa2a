package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness for the PQ stack: times fit / encode / ADC
  * separately at a given sf dir. Usage: runMain graft.ProfilePq [sfDir] */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
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
    import graft.operators.Pq
    val emb = Tables.embeddings(spark, d)
    val model = t("fit")(Pq.fit(emb, "embedding", m = 8, ksub = 16, iters = 8))
    val codes = t("encode+count") {
      val c = Pq.encode(emb, "embedding", model).persist()
      c.count()
      c
    }
    val qv = emb.filter(col("vec_id") === 0L)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head.getSeq[Double](0).toArray
    t("adcTopK x1")(Pq.adcTopK(codes, model, qv, 10).collect())
    t("adcTopK x3") {
      (1 to 3).foreach(_ => Pq.adcTopK(codes, model, qv, 10).collect())
    }
    spark.stop()
  }
}
