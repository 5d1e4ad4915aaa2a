package graft

import graft.sources.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle exchange") {
    val facts = (1 to 2000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dim = (0L to 96L).map(k => (k, s"name$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", "k", 8)
    Bucketing.writeBucketed(dim, "b_dim", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.cocolocatedJoin(spark, "b_facts", "b_dim", "k")
      assert(joined.count() == 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), "bucketed join still shuffled:\n" + plan)
      // and the non-bucketed control DOES shuffle
      val control = facts.join(dim, "k")
      control.count()
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}
