package graft

import graft.expressions.GraftFunctions

/** The SQL surface: registered views + the injected cosine_sim function
  * make every table and custom expression reachable via spark.sql. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer SQL, including the custom expression") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    GraftFunctions.register(spark)
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").collect().head.getLong(0)
    assert(n == 6000L)
    val joined = spark.sql(
      """SELECT p_brand, sum(l_quantity) AS q
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""").collect()
    assert(joined.nonEmpty)
    val cos = spark.sql(
      """SELECT vec_id,
           cosine_sim(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS c
         FROM embeddings LIMIT 5""").collect()
    cos.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
    val topk = spark.sql(
      """SELECT lang, priority_topk(CAST(n_chars AS DOUBLE), doc_id, 3) AS t
         FROM documents GROUP BY lang""").collect()
    topk.foreach(r => assert(r.getSeq[Long](1).size == 3))
  }

  test("NOT IN tri-state NULL semantics (na1's edge, constructed frames)") {
    // NOT EXISTS is two-valued; NOT IN is not: one NULL in the subquery
    // makes every membership test UNKNOWN, so the result is EMPTY, and a
    // NULL probe key is likewise dropped. Pin the semantics na1's
    // docstring claims (its real data has no null keys, so the catalog
    // hash can't see this edge).
    import spark.implicits._
    Seq(Some(1L), Some(2L), None).toDF("k").createOrReplaceTempView("probe")
    Seq(Some(2L), None).toDF("v").createOrReplaceTempView("sub_withnull")
    Seq(Some(2L)).toDF("v").createOrReplaceTempView("sub_clean")
    assert(spark.sql(
      "SELECT k FROM probe WHERE k NOT IN (SELECT v FROM sub_withnull)")
      .count() == 0L) // any NULL in the subquery -> empty
    val clean = spark.sql(
      "SELECT k FROM probe WHERE k NOT IN (SELECT v FROM sub_clean)")
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L)) // 2 matched out; NULL probe dropped (UNKNOWN)
    // and NOT EXISTS on the same frames keeps the NULL probe row
    val ne = spark.sql(
      """SELECT k FROM probe WHERE NOT EXISTS
         (SELECT 1 FROM sub_withnull WHERE v = k)""")
      .collect().map(r => Option(r.get(0))).toSet
    assert(ne == Set(Some(1L), None))
  }
}
