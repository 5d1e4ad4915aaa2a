package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of catalog queries.
  * Usage: runMain graft.ShowPlan <sfDir> <query1,query2,...>
  */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("sm2_mixture_resample"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // bk1's external bucketed tables touch the warehouse root — pin it
      // so no spark-warehouse dir is minted in the launch cwd
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n")
      println(queries.QueryCatalog.byName(n).run(spark, d)
        .queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
