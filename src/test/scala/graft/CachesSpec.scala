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

  test("pretrainingRun releases every internal cache after the consuming action") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 80L)
      .map(i => (i, s"document body ${i % 9} with some shared tokens and a " +
        s"longer tail of words to clear the quality gate number $i",
        if (i % 2 == 0) "en" else "de", if (i % 10 == 0) "eval" else "train"))
      .toDF("doc_id", "text", "lang", "split")
    spark.catalog.clearCache()
    try {
      // thresholds loosened so rows survive every stage — this test is
      // about CACHE lifetime, not funnel semantics (CorpusSpec pins those)
      val st = graft.api.Corpus.pretrainingRun(docs, col("split") === "eval",
        jaccardMin = 0.95, contaminationMax = 1.01, budget = 0.9)
      assert(st.packed.collect().nonEmpty)
      def live() = spark.sparkContext.getPersistentRDDs.size
      // the component walk's localCheckpoint RDD is DATA (truncated
      // lineage), not a leaked cache — allow it plus at most one
      // in-flight release
      val deadline = System.currentTimeMillis() + 20000
      while (live() > 2 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(live() <= 2, s"leaked cached RDDs: ${live()}")
    } finally {
      // checkpointed label RDDs survive catalog.clearCache (raw RDD
      // persists) — drop them so later tests count a clean slate
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
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
