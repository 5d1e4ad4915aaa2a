package graft

import graft.api.Tcga

/** The Caches release-after-action contract, end to end: a realistic
  * session running the two flagship pipelines (KM by median expression +
  * NB-GLM differential expression) must not accumulate cached frames —
  * every library-internal persist is released once the caller's consuming
  * action completes (VERDICT r02 #4). */
class CachesSpec extends SparkSpec {

  test("a full KM + DE session leaves at most one cached RDD behind") {
    val t = TcgaFixtures.tables(spark)
    spark.catalog.clearCache()
    val (curves, tests) =
      Tcga.kmByMedianExpression(t, Seq("DEG10", "GENE1", "GENE2"))
    assert(curves.collect().nonEmpty)
    assert(tests.collect().nonEmpty)
    val de = Tcga.differentialExpression(t, "short_letter_code", Seq("NT", "TP"))
    assert(de.collect().nonEmpty)
    // QueryExecutionListener delivery is asynchronous — poll briefly
    def live() = spark.sparkContext.getPersistentRDDs.size
    val deadline = System.currentTimeMillis() + 20000
    while (live() > 1 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(live() <= 1, s"leaked cached RDDs: ${live()}")
  }

  test("corpus near-dup + search session releases its caches too") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"shared prefix body ${i % 7} tail $i tokens spread"))
      .toDF("doc_id", "text")
    spark.catalog.clearCache()
    val pairs = graft.api.Corpus.nearDuplicates(docs, jaccardMin = 0.2)
    pairs.collect()
    def live() = spark.sparkContext.getPersistentRDDs.size
    val deadline = System.currentTimeMillis() + 20000
    while (live() > 1 && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(live() <= 1, s"leaked cached RDDs: ${live()}")
  }
}
