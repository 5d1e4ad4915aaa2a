package graft

import org.apache.spark.sql.SparkSession

class GraftSessionSpec extends SparkSpec {

  test("GraftSession configures the engine's assumed settings on a builder") {
    // a builder is a bag of (k, v) until getOrCreate; read it back via the
    // options map reflection-free by building a session IN the shared
    // context: runtime confs (timeZone, AQE, shuffle partitions) apply to
    // the new session even though the context is shared. The static
    // extensions conf is covered by ExpressionsSpec's injector test.
    spark.sparkContext // force the shared suite context first
    val s = GraftSession(SparkSession.builder(), shufflePartitions = 7)
      .getOrCreate()
    try {
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
      assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    } finally {
      // restore the suite session's confs (getOrCreate returned the shared
      // session with the new runtime confs applied)
      s.conf.set("spark.sql.session.timeZone", "UTC")
      s.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("a GraftSession-configured session runs a catalog query end to end") {
    val df = queries.QueryCatalog.byName("x2_quality_score")
      .run(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }
}
