package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.queries.QueryCatalog

/** Behavior tests for the round-4 analytics queries (AnalyticsQueries).
  * The DuckDB oracle checks value equality per engine-pair; these assert
  * the SEMANTIC invariants on the sf0.001 data plus handcrafted frames
  * for the session-gap boundary. */
class AnalyticsSpec extends SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("tf1: at most 3 terms per doc, ranked by descending score") {
    val rows = QueryCatalog.byName("tf1_tfidf_topk").run(spark, sf)
      .select("doc_id", "rnk", "score").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      rs.length should be <= 3
      val ordered = rs.sortBy(_.getLong(1))
      ordered.map(_.getLong(1)).toSeq shouldBe (1L to ordered.length)
      // scores non-increasing in rank (equal allowed on term tiebreak)
      ordered.sliding(2).foreach {
        case Array(a, b) => a.getDouble(2) should be >= (b.getDouble(2) - 1e-9)
        case _ => ()
      }
    }
  }

  test("lm1: mean log-prob is negative, perplexity = exp(-mean)") {
    val rows = QueryCatalog.byName("lm1_unigram_lm").run(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_logprob")
      val ppl = r.getAs[Double]("ppl")
      mean should be < 0.0 // MLE prob of any token < 1 in a multi-token corpus
      ppl shouldBe math.exp(-mean) +- 1e-4 // both rounded to 6 dp
    }
  }

  test("se1: sessions split strictly beyond the 30-min gap") {
    import spark.implicits._
    // user 1: events at 0s, 1700s, 3500s (gaps 1700/1800 — SAME session:
    // the break needs gap > 1800s), then 5301s (gap 1801s — new session)
    val us = 1000000L
    val ev = Seq(
      (1L, 1L, 0L * us, 1.0), (2L, 1L, 1700L * us, 1.0),
      (3L, 1L, 3500L * us, 1.0), (4L, 1L, 5301L * us, 1.0),
      (5L, 2L, 0L * us, 1.0))
      .toDF("event_id", "user_id", "tsu", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
    val sess = ev.withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800L * us, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("brk")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "session_seq").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sess shouldBe Set((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L))
  }

  test("se1 on events: session count and event conservation") {
    val out = QueryCatalog.byName("se1_sessionize").run(spark, sf)
      .agg(sum("n_events").as("total"), count(lit(1)).as("sessions"))
      .collect()(0)
    val nEvents = Tables.events(spark, sf).count()
    out.getAs[Long]("total") shouldBe nEvents
    out.getAs[Long]("sessions") should be <= nEvents
  }

  test("ru1: grand total equals the sum of the leaf rows") {
    val rows = QueryCatalog.byName("ru1_rollup_revenue").run(spark, sf).collect()
    val leaf = rows.filter(_.getAs[Long]("lvl") == 0L)
    val grand = rows.filter(_.getAs[Long]("lvl") == 3L)
    grand.length shouldBe 1
    grand(0).getAs[Double]("revenue") shouldBe
      (leaf.map(_.getAs[Double]("revenue")).sum +- 1e-2)
    grand(0).getAs[Long]("n_orders") shouldBe leaf.map(_.getAs[Long]("n_orders")).sum
  }

  test("fz1: distances respect the length lower bound and the threshold") {
    val rows = QueryCatalog.byName("fz1_fuzzy_pairs").run(spark, sf).collect()
    // the injected twins (doc_id + 10^7, 4-char suffix) guarantee hits
    rows should not be empty
    rows.foreach(_.getAs[Long]("dist") should be <= 20L)
    // symmetric pair convention: a < b always
    rows.foreach(r => r.getAs[Long]("doc_a") should be < r.getAs[Long]("doc_b"))
    // every twin pair is found at exactly its suffix distance
    val twinPairs = rows.filter(r =>
      r.getAs[Long]("doc_b") - r.getAs[Long]("doc_a") == 10000000L)
    twinPairs should not be empty
    twinPairs.foreach(_.getAs[Long]("dist") shouldBe 4L)
  }

  test("w1: running spend is non-decreasing per customer in order sequence") {
    val rows = QueryCatalog.byName("w1_window_family").run(spark, sf)
      .select("o_custkey", "pr", "run_spend").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getDouble(1))
      byRank.map(_.getDouble(2)).sliding(2).foreach {
        case Array(a, b) => b should be >= a - 1e-9
        case _ => ()
      }
    }
  }

  test("cl1: every cluster mean has all 64 dimensions and consistent size") {
    val rows = QueryCatalog.byName("cl1_kmeans_step").run(spark, sf)
      .collect().map(r => (r.getAs[Long]("cid"), r.getAs[Long]("dim_i"),
        r.getAs[Long]("n_members")))
    val byC = rows.groupBy(_._1)
    byC.size should be >= 2 // several seeds at sf0.001
    byC.foreach { case (_, rs) =>
      rs.map(_._2).sorted.toSeq shouldBe (1L to 64L)
      rs.map(_._3).toSet.size shouldBe 1 // same member count on every dim
    }
    // every corpus vector lands in exactly one cluster
    rows.filter(_._2 == 1L).map(_._3).sum shouldBe
      Tables.embeddings(spark, sf).count()
  }

  test("wz1: winsorized values stay inside the per-flag band") {
    val out = QueryCatalog.byName("wz1_winsorize").run(spark, sf)
    val bad = out.filter(
      (col("clipped") && col("wins_price") === col("price")) ||
        (!col("clipped") && col("wins_price") =!= col("price"))).count()
    bad shouldBe 0L
    // each flag keeps ~2% clipped rows (1% per tail, discrete-rank rounding)
    val fracs = out.groupBy("flag")
      .agg((sum(when(col("clipped"), 1).otherwise(0)) / count(lit(1))).as("f"))
      .collect().map(_.getAs[Double]("f"))
    fracs.foreach { f => f should be < 0.05; f should be > 0.0 }
  }

  test("lm2: Kneser-Ney probabilities match the hand-computed fixture") {
    import spark.implicits._
    // corpus: doc1 "a b a c", doc2 "b a"
    // bigram counts: (a,b):1 (b,a):2 (a,c):1
    // c1: a→(c1=2,n1f=2)  b→(c1=2,n1f=1); N1+(.w2): a,b,c each 1; types=3
    // P(b|a) = .25/2 + (.75*2/2)*(1/3) = 0.375        (= P(c|a))
    // P(a|b) = 1.25/2 + (.75*1/2)*(1/3) = 0.75
    val docs = Seq((1L, "a b a c"), (2L, "b a")).toDF("doc_id", "text")
    val out = graft.api.Corpus.knBigramScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_logprob")))
      .toMap
    out(1L)._1 shouldBe 3L
    out(1L)._2 shouldBe ((2 * math.log(0.375) + math.log(0.75)) / 3) +- 1e-12
    out(2L)._1 shouldBe 1L
    out(2L)._2 shouldBe math.log(0.75) +- 1e-12
  }

  test("fn1: stage timestamps are ordered; stage counts form a funnel") {
    val rows = QueryCatalog.byName("fn1_funnel").run(spark, sf).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val s = r.getAs[Long]("s_ts")
      val c = Option(r.get(r.fieldIndex("c_ts"))).map(_.asInstanceOf[Long])
      val p = Option(r.get(r.fieldIndex("p_ts"))).map(_.asInstanceOf[Long])
      c.foreach(_ should be >= s)
      (c, p) match {
        case (Some(ct), Some(pt)) => pt should be >= ct
        case (None, Some(_)) => fail("purchase stage without click stage")
        case _ => ()
      }
      r.getAs[Long]("stage") shouldBe (1L + c.size + p.size)
    }
    val byStage = rows.groupBy(_.getAs[Long]("stage")).view.mapValues(_.length)
    // users reaching stage >= k are non-increasing in k
    val s1 = rows.length
    val s2 = byStage.getOrElse(2L, 0) + byStage.getOrElse(3L, 0)
    val s3 = byStage.getOrElse(3L, 0)
    s1 should be >= s2
    s2 should be >= s3
  }

  test("co1: offsets non-negative; cohort totals cover every user once at offset 0 scale") {
    val rows = QueryCatalog.byName("co1_cohort_retention").run(spark, sf)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_users")))
    rows.length should be > 0
    rows.foreach { case (_, off, n) => off should be >= 0L; n should be > 0L }
    // every user appears in their cohort's offset-0 cell
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val offset0 = rows.filter(_._2 == 0L).map(_._3).sum
    offset0 shouldBe users
  }

  test("lm2: single-token docs are excluded, ppl = exp(-mean)") {
    val out = QueryCatalog.byName("lm2_bigram_kn").run(spark, sf).collect()
    out.length should be > 0
    out.foreach { r =>
      r.getAs[Long]("n_bigrams") should be >= 1L
      val mean = r.getAs[Double]("mean_logprob")
      mean should be < 0.0
      r.getAs[Double]("ppl") shouldBe math.exp(-mean) +- 1e-4
    }
    // output cardinality = docs with >= 2 whitespace tokens
    val expected = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.size(
        graft.operators.TextFunctions.tokens(col("text"))) >= 2)
      .count()
    assert(out.length.toLong == expected)
  }

  test("hl1: HLL vocabulary estimate within 2 rsd of the exact distinct count") {
    import org.apache.spark.sql.functions._
    val approx = QueryCatalog.byName("hl1_approx_distinct").run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.documents(spark, sf)
      .select(col("lang"),
        explode(graft.operators.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("lang").agg(count_distinct(col("token")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (lang, n) =>
      val err = math.abs(approx(lang).toDouble - n) / n
      assert(err <= 0.04, s"$lang: approx ${approx(lang)} vs exact $n (err $err)")
    }
  }

  test("bs1: bootstrap CI brackets the mean, SE positive, replica count full") {
    val out = QueryCatalog.byName("bs1_poisson_bootstrap").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (m, se) = (r.getAs[Double]("boot_mean"), r.getAs[Double]("boot_se"))
      val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(r.getAs[Long]("n_boot") == 32L, s"all replicas nonempty expected: $r")
      assert(se > 0, s"degenerate bootstrap SE: $r")
      assert(lo <= m && m <= hi, s"CI must bracket the mean: $r")
      // the sample range of n points is mathematically <= sqrt(2(n-1))
      // sample SDs (~7.9 at n=32); a quantile landing outside that
      // envelope means the percentile mixed groups or values
      assert(hi - lo <= 7.9 * se, s"CI outside the n=32 range envelope: $r")
    }
  }

  test("gc1: Gini matches an independent recomputation per source") {
    import org.apache.spark.sql.functions._
    val out = QueryCatalog.byName("gc1_vocab_gini").run(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("gini"))).toMap
    assert(out.nonEmpty)
    // independent route: collect the (source, term) counts and apply the
    // rank identity directly in Scala
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .groupBy("source", "token").count().collect()
      .groupBy(_.getAs[String]("source"))
    counts.foreach { case (src, rows) =>
      val ks = rows.map(_.getAs[Long]("count")).sorted
      val n = ks.length.toLong
      val s1 = ks.sum
      val s2 = ks.zipWithIndex.map { case (k, i) => (i + 1L) * k }.sum
      val gini = 2.0 * s2 / (n.toDouble * s1) - (n + 1.0) / n
      val (qn, qs1, qg) = out(src)
      assert(qn == n, s"$src n_terms: $qn vs $n")
      assert(qs1 == s1, s"$src n_tokens: $qs1 vs $s1")
      assert(math.abs(qg - gini) < 1e-6, s"$src gini: $qg vs $gini")
      assert(qg >= 0.0 && qg < 1.0, s"$src gini range: $qg")
    }
  }
}
