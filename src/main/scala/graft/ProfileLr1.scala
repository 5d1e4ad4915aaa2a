package graft
import org.apache.spark.sql.SparkSession

/** Profiling main for the r10 verdict-#6 lr1 band question: runs the lr1
  * quality-classifier fit twice (same JVM, caches cleared between) with
  * the `graft` logger at INFO so `LogisticRegression.fit`'s per-iteration
  * wall-time lines print (Bench runs at WARN, which silences them). The
  * decomposition — Newton iteration count × per-pass seconds — is what
  * lets an out-of-band driver number be attributed to convergence-path
  * change vs environment; the measured band lives in BASELINE.md. */
object ProfileLr1 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // re-open the graft package loggers AFTER setLogLevel (which moves
    // the log4j2 ROOT to ERROR): the iteration lines are the output here
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val conf = ctx.getConfiguration
    conf.addLogger("graft",
      new org.apache.logging.log4j.core.config.LoggerConfig(
        "graft", org.apache.logging.log4j.Level.INFO, true))
    ctx.updateLoggers()
    (1 to 2).foreach { round =>
      println(s"---- round $round")
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = queries.QueryCatalog.byName("lr1_quality_classifier")
        .run(spark, d).count()
      println(f"[prof] lr1 total: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
