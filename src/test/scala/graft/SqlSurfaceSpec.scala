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
}
