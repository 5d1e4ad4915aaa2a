package graft

import org.apache.spark.sql.functions._
import graft.sources.Partitioning

class PartitioningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("static partition pruning: a lang predicate never reads other partitions") {
    val docs = Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Partitioning.writePartitioned(docs, path, "lang")
    val part = Partitioning.readPartitioned(spark, path)

    val en = part.filter(col("lang") === "en")
    val n = en.count()
    // value parity with the unpartitioned filter
    assert(n == docs.filter(col("lang") === "en").count())
    // the predicate must be a PLANNING-time partition filter...
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    // ...and only files under lang=en are touched
    val files = en.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")), files.mkString("\n"))
  }

  test("dynamic partition pruning: a filtered dim join prunes the fact scan at runtime") {
    val docs = Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Partitioning.writePartitioned(docs, path, "lang")
    val fact = Partitioning.readPartitioned(spark, path)
    // dim table: language metadata; the filter on it is NOT a literal
    // predicate on the fact, so only DPP can prune the fact scan
    import spark.implicits._
    // the dim must be a real scan: a LocalRelation folds its filter away
    // (ConvertToLocalRelation), leaving no selective predicate for the
    // DPP rule to key on
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("en", "keep"), ("de", "drop"), ("es", "drop"),
      ("fr", "drop"), ("zh", "drop")).toDF("lang", "verdict")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    // kB-scale test data fails DPP's cost heuristic (pruning benefit is
    // estimated against the scan size); force the decision so the test
    // exercises the MECHANISM — at real scale the stats say yes on their own
    val prevStats = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prevRatio = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    try {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000")
      // NOTE: no input_file_name() probe here — a nondeterministic
      // projection above the scan blocks the very pruning under test;
      // the scan's own numFiles metric is the honest witness
      val joined = fact.join(dim, "lang").filter(col("verdict") === "keep")
      val n = joined.count()
      assert(n == docs.filter(col("lang") === "en").count())
      val plan = joined.queryExecution.executedPlan
      assert(plan.toString.contains("dynamicpruning"), plan.toString)
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: flatten(q.plan)
        case other => other +: other.children.flatMap(flatten)
      }
      val factScan = flatten(plan).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("graft_dpp")) &&
            !f.metadata.get("Location").exists(_.contains("graft_dpp_dim")) => f
      }.getOrElse(fail("fact FileSourceScanExec not found"))
      val totalFiles = docs.select("lang").distinct().count() // >= 1 file per lang dir
      val readFiles = factScan.metrics("numFiles").value
      assert(readFiles < totalFiles,
        s"DPP read $readFiles files, expected fewer than $totalFiles")
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", prevRatio)
    }
  }
}
