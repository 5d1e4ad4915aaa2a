package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.queries.QueryCatalog

/** Behavior tests for the round-4 curation queries (CurationQueries):
  * deterministic shuffle/sharding, rule-filter audit, chunking coverage,
  * mixture resampling, incremental dedup. The DuckDB oracle checks value
  * equality per engine-pair; these assert the SEMANTIC invariants. */
class CurationSpec extends SparkSpec with Matchers {

  private val sf = "/root/testdata/sf0.001"

  test("sh1: ranks are a permutation, shards balanced within one row") {
    val rows = QueryCatalog.byName("sh1_shuffle_shard").run(spark, sf)
      .select("rn", "shard_id").collect()
    val n = rows.length
    rows.map(_.getLong(0)).sorted.toSeq shouldBe (1L to n)
    val byShard = rows.groupBy(_.getLong(1)).view.mapValues(_.length)
    byShard.keys.foreach(_ should (be >= 0L and be < 16L))
    // round-robin assignment: shard sizes differ by at most 1
    (byShard.values.max - byShard.values.min) should be <= 1
  }

  test("sh1: the order is a pure function of (seed, id) — layout-stable") {
    val docs = graft.Tables.documents(spark, sf)
    val a = graft.api.Corpus.shuffleShards(docs.repartition(7), nShards = 4)
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = graft.api.Corpus.shuffleShards(docs.repartition(3), nShards = 4)
      .select("doc_id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    a shouldBe b
  }

  test("x7: keep is exactly the conjunction of the rule flags") {
    val rows = QueryCatalog.byName("x7_rule_filters").run(spark, sf).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Boolean]("keep") shouldBe
        (r.getAs[Boolean]("r_len") && r.getAs[Boolean]("r_mwl") &&
          r.getAs[Boolean]("r_distinct") && r.getAs[Boolean]("r_stop"))
    }
    // the rules must actually discriminate on this corpus (non-vacuous)
    rows.count(_.getAs[Boolean]("keep")) should be > 0
    rows.count(!_.getAs[Boolean]("keep")) should be > 0
  }

  test("ch1: chunks tile every doc — full coverage, correct overlap") {
    val docs = graft.Tables.documents(spark, sf)
    val nTok = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.operators.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = QueryCatalog.byName("ch1_doc_chunks").run(spark, sf)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    chunks.keySet shouldBe nTok.keySet // every doc chunks (even short ones)
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // starts advance by exactly the stride, from zero, below n_tok
      sorted.map(_.getAs[Long]("start")).toSeq shouldBe
        (0L until nTok(id) by 24L).toSeq
      // every chunk is full-size except possibly the tail ones
      sorted.foreach { c =>
        val expect = math.min(32L, nTok(id) - c.getAs[Long]("start"))
        c.getAs[Long]("n_chunk_tokens") shouldBe expect
      }
    }
  }

  test("sm2: kept corpus is a subset, rates respect the mixture cap") {
    val out = QueryCatalog.byName("sm2_mixture_resample").run(spark, sf)
    val rows = out.select("source", "sample_rate").distinct().collect()
    rows should not be empty
    rows.foreach(_.getAs[Double]("sample_rate") should (be > 0.0 and be <= 1.0))
    // class 0 (weight .4) must not be thinned harder than class 3 (.1)
    val bySrc = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    for {
      (s0, r0) <- bySrc if s0.stripPrefix("src").toInt % 4 == 0
      (s3, r3) <- bySrc if s3.stripPrefix("src").toInt % 4 == 3
    } r0 should be >= r3
  }

  test("dd7: bipartite — every match pairs a new doc with a reference doc") {
    val docs = graft.Tables.documents(spark, sf)
    val isRef = substring(col("source"), 4, 10).cast("int") < 15
    val refIds = docs.filter(isRef).select("doc_id").collect().map(_.getLong(0)).toSet
    val out = QueryCatalog.byName("dd7_incremental_dedup").run(spark, sf).collect()
    out.foreach { r =>
      refIds should not contain r.getAs[Long]("doc_id")
      refIds should contain(r.getAs[Long]("first_ref"))
      r.getAs[Long]("n_ref_matches") should be >= 1L
    }
  }

  test("x7 rule filter is stream-ready: readStream through the same projection matches batch") {
    import org.apache.spark.sql.streaming.OutputMode
    val docs = graft.Tables.documents(spark, sf)
    val expect = graft.api.Corpus.ruleFiltered(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("part-0.parquet"))
    val streamDocs = spark.readStream.schema(docs.schema).parquet(dir.toString)
    val q = graft.api.Corpus.ruleFiltered(streamDocs)
      .writeStream.format("memory").queryName("doc_rule_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("doc_rule_stream")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
    } finally q.stop()
  }

  test("dd7 API: planted near-dup in the new batch is flagged, clean doc is not") {
    import spark.implicits._
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 1
      (11L, "totally different words about completely unrelated matters here now"))
      .toDF("doc_id", "text")
    val out = graft.api.Corpus.incrementalDuplicates(fresh, ref)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("first_ref")).toMap
    out.keySet should contain(10L)
    out(10L) shouldBe 1L
    out.keySet should not contain 11L
  }

  test("ds1: DSIR weights match the hand-computed fixture and rank target-like docs first") {
    import spark.implicits._
    // target slice = src "tgt". raw counts: x:4 y:4 (tr=8, v=2);
    // target counts: x:3 (tt=3).
    // p_t(x)=(3+.5)/(3+1)=.875  p_t(y)=.5/4=.125  p_r(x)=p_r(y)=.5
    // lr(x)=ln(1.75)  lr(y)=ln(.25)
    val docs = Seq(
      (1L, "tgt", "x x x"), (2L, "raw", "y y y"), (3L, "raw", "x y"))
      .toDF("doc_id", "source", "text")
    val out = graft.api.Corpus.dsirScores(docs, col("source") === "tgt")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("w")).toMap
    out(1L) shouldBe math.log(1.75) +- 1e-12
    out(2L) shouldBe math.log(0.25) +- 1e-12
    out(3L) shouldBe ((math.log(1.75) + math.log(0.25)) / 2) +- 1e-12
    out(1L) should be > out(3L)
    out(3L) should be > out(2L)
  }

  test("ds1: top-N selection emits the contracted shape") {
    val out = QueryCatalog.byName("ds1_dsir_select").run(spark, sf)
    out.count() should be <= 50L
    out.columns.sorted shouldBe Array("doc_id", "n_tokens", "source", "weight")
  }

  test("dr1: PSI contributions are non-negative and shares are distributions") {
    import org.apache.spark.sql.functions._
    val out = QueryCatalog.byName("dr1_mixture_drift").run(spark, sf)
    // (p_new - p_old) and ln(p_new/p_old) always share sign
    assert(out.filter(col("psi") < 0).count() == 0)
    val sums = out.agg(sum("p_old"), sum("p_new")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4, sums)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-4, sums)
  }

  test("auc1: AUC in [0,1] per source, best source clearly above chance") {
    val out = QueryCatalog.byName("auc1_rank_auc").run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Double]("auc")
      assert(a >= 0.0 && a <= 1.0, s"auc out of range: $r")
      assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
    }
    // the frozen scorer imitates the rule labels up to the 10% flip
    // noise, so at least the best-separated source must beat chance
    // (exact planted-ranking values are asserted in StatsSpec.rankAuc)
    val perSource = out.map(r => r.getAs[Double]("auc"))
    assert(perSource.max > 0.6,
      s"scorer should beat chance somewhere: ${perSource.mkString(",")}")
  }

  test("cal1: bins partition the corpus, mean_p inside its decile, brier bounded") {
    val out = QueryCatalog.byName("cal1_calibration_bins").run(spark, sf).collect()
    assert(out.nonEmpty)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n")).sum == total,
      "every document lands in exactly one (source, bin) cell")
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin <= 9, s"bin range: $r")
      val mp = r.getAs[Double]("mean_p")
      // mean of p's in [bin/10, (bin+1)/10) stays inside the decile
      // (bin 9 also absorbs p = 1.0); 1e-6 slack for the 6-dp rounding
      assert(mp >= bin / 10.0 - 1e-6 && mp <= (bin + 1) / 10.0 + 1e-6,
        s"mean_p outside decile: $r")
      val fp = r.getAs[Double]("frac_pos")
      assert(fp >= 0.0 && fp <= 1.0, s"frac_pos range: $r")
      val brier = r.getAs[Double]("brier")
      assert(brier >= 0.0 && brier <= 1.0, s"brier range: $r")
    }
  }

  test("dp1: noise bounded by the ladder cap and actually fires") {
    import org.apache.spark.sql.functions._
    val out = QueryCatalog.byName("dp1_noisy_counts").run(spark, sf)
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source", "lang").agg(count(lit(1)).as("n_true"))
    val j = out.join(truth, Seq("source", "lang")).collect()
    assert(j.nonEmpty && j.length == truth.count())
    val noises = j.map(r => r.getAs[Long]("noisy_n") - r.getAs[Long]("n_true"))
    // each side of the two-sided geometric is ladder-capped at 30
    assert(noises.forall(n => math.abs(n) <= 60), noises.mkString(","))
    assert(noises.exists(_ != 0L), "noise never fired — ladder broken")
    // E|G1 - G2| ~ 0.66 at eps = 1; a mean far above that means the
    // threshold comparison is inverted or mis-scaled
    val meanAbs = noises.map(math.abs).sum.toDouble / noises.length
    assert(meanAbs < 3.0, s"implausible noise magnitude: $meanAbs")
  }

  test("cm1: confusion counts partition each source, ratios consistent") {
    val out = QueryCatalog.byName("cm1_confusion_matrix").run(spark, sf).collect()
    assert(out.nonEmpty)
    val docTotal = spark.read.parquet(s"$sf/documents.parquet").count()
    val cells = out.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn")).sum
    assert(cells == docTotal, "every doc lands in exactly one confusion cell")
    out.foreach { r =>
      val (tp, fp, fn) =
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"))
      Seq("precision", "recall", "f1").foreach { c =>
        Option(r.getAs[java.lang.Double](c)).foreach { v =>
          assert(v >= 0.0 && v <= 1.0, s"$c out of range: $r")
        }
      }
      // F1 recomputed from the harmonic-mean identity must agree with
      // the count-identity form the query emits
      if (tp + fp > 0 && tp + fn > 0 && tp > 0) {
        val p = tp.toDouble / (tp + fp); val rc = tp.toDouble / (tp + fn)
        assert(math.abs(r.getAs[Double]("f1") - 2 * p * rc / (p + rc)) < 1e-6,
          s"f1 identity: $r")
      }
    }
  }

  test("dm1: weights form a distribution, upweighting tracks excess loss") {
    val out = QueryCatalog.byName("dm1_doremi_weights").run(spark, sf).collect()
    assert(out.length > 1, "need several domains to reweight")
    val wsum = out.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must normalize: $wsum")
    out.foreach { r =>
      assert(r.getAs[Double]("excess") >= 0.0, s"excess clamps at 0: $r")
      assert(r.getAs[Double]("weight") > 0.0, s"every domain keeps mass: $r")
      assert(r.getAs[Double]("mean_nll") > 0.0, s"NLL is positive: $r")
    }
    // the exponentiated-gradient step is monotone: any domain with
    // positive excess loss must outweigh every zero-excess domain
    val (hot, base) = out.partition(_.getAs[Double]("excess") > 0)
    if (hot.nonEmpty && base.nonEmpty)
      assert(hot.map(_.getAs[Double]("weight")).min >
        base.map(_.getAs[Double]("weight")).max - 1e-9,
        s"monotonicity: ${out.mkString(";")}")
  }
}
