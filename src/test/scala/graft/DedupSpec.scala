package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again", "a"),
    (2L, "the quick brown fox jumps over the lazy dog again and again", "a"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and often", "a"), // near dup
    (4L, "completely different content about spark query engines here", "a"),
    (5L, "totally unrelated words nothing shared with any other row", "b"))
    .toDF("doc_id", "text", "source")

  test("exact: duplicates collapse to the min-id keeper") {
    val r = Dedup.exact(docs, "doc_id", "text").collect()
    assert(r.length == 4) // 5 docs, one exact pair
    val dup = r.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper") == 1L)
  }

  test("minhash LSH: identical docs are always candidates; disjoint docs never") {
    val sigs = Dedup.minhashSignatures(Dedup.shingleRows(docs, "doc_id", "text", 3), 6)
    val cands = Dedup.minhashCandidates(sigs, 6, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L))) // identical shingle sets: all bands match
    assert(!cands.contains((4L, 5L)) && !cands.contains((1L, 5L)))
  }

  test("simhash: identical texts equal; near-dups closer than unrelated") {
    val sh = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) <= ham(sh(1L), sh(5L)))
  }

  test("simhashNearPairs: identical docs found at hamming 0, strangers excluded") {
    val sigs = Dedup.simhash(docs, "doc_id", "text", 16)
    val near = Dedup.simhashNearPairs(sigs, bits = 16, bandBits = 4, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("hamming"))).toMap
    assert(near.get((1L, 2L)).contains(0L)) // identical text
    assert(!near.contains((4L, 5L))) // unrelated docs stay apart
  }

  test("minhash families: one md5 per shingle, affine coefficients distinct and nonzero") {
    val cs = Dedup.minhashCoeffs(16)
    assert(cs.map(_._1).distinct.size == 16 && cs.map(_._2).distinct.size == 16)
    assert(cs.forall { case (a, b) => a > 0 && b >= 0 &&
      a < Dedup.MinhashP && b < Dedup.MinhashP })
  }

  test("hot LSH bucket is dropped by the cap, normal candidates survive") {
    // 40 identical boilerplate docs land every band in ONE bucket of 40 —
    // uncapped that is 40·39/2 = 780 pairs from a single degenerate bucket
    val boiler = (100L until 140L)
      .map(i => (i, "boilerplate header repeated on every page of the crawl", "a"))
    val adversarial = docs.union(boiler.toDF("doc_id", "text", "source"))
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleRows(adversarial, "doc_id", "text", 3), 6)
    val capped = Dedup.minhashCandidates(sigs, 6, 2, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)), "normal near-dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a >= 100L || b >= 100L },
      "hot-bucket members must be dropped, not exploded into m² pairs")
    val uncapped = Dedup.minhashCandidates(sigs, 6, 2, maxBucket = Int.MaxValue)
    assert(uncapped.count() >= 780L)
  }

  test("two capped ops compose in one plan (unique observe names)") {
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleRows(docs, "doc_id", "text", 3), 6)
    val a = Dedup.minhashCandidates(sigs, 6, 2, maxBucket = 10)
    val b = Dedup.minhashCandidates(sigs, 6, 2, maxBucket = 20)
    // same-named observations in one query fail analysis; this must not
    assert(a.union(b).count() >= a.count())
  }

  test("hot shingle inside a block is dropped by the jaccard cap") {
    val boiler = (100L until 120L)
      .map(i => (i, s"common prefix shared everywhere then unique tail $i", "a"))
    val adversarial = docs.union(boiler.toDF("doc_id", "text", "source"))
    // "common prefix", "prefix shared", "shared everywhere" 2-grams occur in
    // all 20 boiler docs; cap 10 drops them from intersection counting
    val capped = Dedup.jaccardPairs(adversarial, "doc_id", "text", "source", 2, 0.99,
        maxShingleDocs = 10)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(capped.contains((1L, 2L)), "exact dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a >= 100L && b >= 100L },
      "boiler docs only shared capped shingles — no surviving pair")
  }

  test("jaccard cap is symmetric: sizes count only retained shingles") {
    val boiler = (100L until 120L)
      .map(i => (i, s"common prefix shared everywhere then unique tail $i", "a"))
    // two exact dups that ALSO contain the capped "common prefix" shingle:
    // over the retained set they are identical → jaccard must be exactly 1.0
    // (the old asymmetric cap counted the capped shingle into |A∪B| and
    // reported < 1.0 for them)
    val twins = Seq(
      (200L, "common prefix alpha beta gamma delta", "a"),
      (201L, "common prefix alpha beta gamma delta", "a"))
    val adversarial = docs.union((boiler ++ twins).toDF("doc_id", "text", "source"))
    val row = Dedup.jaccardPairs(adversarial, "doc_id", "text", "source", 2, 0.5,
        maxShingleDocs = 10)
      .filter($"doc_a" === 200L && $"doc_b" === 201L)
      .collect()
    assert(row.length == 1)
    assert(row(0).getAs[Double]("jaccard") == 1.0)
    // "common prefix" occurs in 22 docs of block a (> cap 10): excluded
    // from the size too, so na counts only the 4 retained 2-grams
    assert(row(0).getAs[Long]("na") == 4L)
  }

  test("contamination: test docs sharing train n-grams are flagged; others not") {
    val corpus = Seq(
      // train split
      (1L, "alpha beta gamma delta epsilon zeta", true),
      (2L, "one two three four five six seven", true),
      // test split: 10 leaks the 'alpha beta gamma' 3-gram; 11 is clean
      (10L, "alpha beta gamma completely novel ending", false),
      (11L, "nothing here overlaps with training text", false))
      .toDF("doc_id", "text", "is_train")
    val got = Dedup.contamination(corpus, "doc_id", "text", $"is_train", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("contamination"))).toMap
    assert(got.keySet === Set(10L)) // only the leaking doc is reported
    assert(got(10L)._1 === 1L) // exactly one shared 3-gram
    assert(got(10L)._2 === 0.25) // of its 4 distinct 3-grams
  }

  test("contamination cap: boilerplate shingles leave the train dictionary") {
    // one boilerplate 3-gram in 12 train docs (> cap 10); a test doc whose
    // ONLY overlap is that boilerplate must come out clean
    val train = (1L to 12L).map(i => (i, s"standard header text unique tail $i", true))
    val test = Seq((100L, "standard header text but otherwise novel", false))
    val corpus = (train ++ test).toDF("doc_id", "text", "is_train")
    val flagged = Dedup.contamination(corpus, "doc_id", "text", $"is_train", 3,
        maxShingleTrainDocs = 10)
      .collect()
    assert(flagged.isEmpty, flagged.mkString(","))
    // without the cap the same doc IS flagged (sanity that the fixture leaks)
    val uncapped = Dedup.contamination(corpus, "doc_id", "text", $"is_train", 3)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(uncapped === Set(100L))
  }

  test("cap drop AUDIT: the observe metric reports the exact dropped-dictionary count") {
    // The 100 TB degrade-measurably claim is the METRIC, not just the
    // filter: a hot bucket must leave the dictionary COUNTED. Capture the
    // CollectMetrics rows the way DropAudit's listener does and assert the
    // boilerplate shingle is reported as exactly 1 dropped dictionary row,
    // on BOTH contamination variants.
    val captured = scala.collection.concurrent.TrieMap[String, Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_capped_contamination"))
            captured.put(name, row.getAs[Long]("dropped_rows")): Unit
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // 5 train docs share ONE boilerplate 3-gram (cap 3 -> dropped);
      // a 6th contributes one genuine shingle the test doc also has
      val train = (1L to 5L).map(i => (i, "common header line", true)) :+
        ((6L, "alpha beta gamma", true))
      val testDoc = Seq((100L, "common header line alpha beta gamma", false))
      val corpus = (train ++ testDoc).toDF("doc_id", "text", "is_train")
      def check(df: org.apache.spark.sql.DataFrame): Unit = {
        val out = df.collect()
        assert(out.length == 1)
        val r = out.head
        // 4 distinct test shingles; only "alpha beta gamma" counts as
        // shared — the boilerplate gram is capped OUT of the dictionary
        assert(r.getAs[Long]("doc_id") == 100L && r.getAs[Long]("n_sh") == 4L &&
          r.getAs[Long]("n_shared") == 1L, r.toString)
      }
      captured.clear()
      check(Dedup.contamination(corpus, "doc_id", "text", $"is_train", 3,
        maxShingleTrainDocs = 3))
      // listener delivery is async
      val deadline = System.currentTimeMillis() + 10000
      while (captured.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(captured.values.toSeq == Seq(1L),
        s"expected exactly one audit of 1 dropped row, got $captured")
      captured.clear()
      check(Dedup.contaminationBloom(corpus, "doc_id", "text", $"is_train", 3,
        maxShingleTrainDocs = 3, expectedItems = 64, fpp = 0.01))
      val deadline2 = System.currentTimeMillis() + 10000
      while (captured.isEmpty && System.currentTimeMillis() < deadline2)
        Thread.sleep(100)
      assert(captured.values.toSeq == Seq(1L),
        s"expected exactly one audit of 1 dropped row, got $captured")
    } finally spark.listenerManager.unregister(listener)
  }

  test("minhashJaccardEstimate: exact dup estimates 1.0; estimate tracks exact Jaccard") {
    val k = 6
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleRows(docs, "doc_id", "text", 2), k)
    val pairs = Dedup.minhashCandidates(sigs, k, bandsOf = 2)
    val est = Dedup.minhashJaccardEstimate(sigs, pairs, k)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("est_jaccard"))).toMap
    // docs 1 and 2 are verbatim dups: every minhash component matches
    assert(est((1L, 2L)) == 1.0)
    // the estimator is bounded and quantized to 1/K — compared at the
    // 6-dp rounding's own scale (est is round(m/K, 6), so v*K sits up to
    // K·5e-7 off the integer m; a 1e-9 tolerance would falsely fail any
    // m ∉ {0, 3, 6})
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(est.values.forall(v =>
      math.abs(v - (v * k).round.toDouble / k) < 5e-7), est)
    // near-dup (1, 3) must estimate ABOVE any unrelated pair the bands
    // happened to surface — the ordering, not the value, is the contract
    // a 1/K-granular estimator can make at K = 6
    val nearDup = est.get((1L, 3L))
    nearDup.foreach { nd =>
      est.foreach { case ((a, b), v) =>
        if (Set(a, b).intersect(Set(1L, 2L, 3L)).isEmpty)
          assert(v <= nd, s"unrelated ($a,$b)=$v above near-dup $nd")
      }
    }
  }

  test("longestSelfRepeat: overlapping periodic repeat measured exactly; clean doc 0") {
    val corpus = Seq(
      // "a b c a b c a b": grams repeat at distance 3 -> diagonal-3 chain
      // pa = 3,4,5,6 -> run length 4 -> repeat of 4 - 1 + 2 = 5 tokens
      // ("a b c a b" at positions 0 and 3, overlapping — classic LRS)
      (1L, "a b c a b c a b"),
      (2L, "all these tokens appear exactly once here"),
      // disjoint repeat: "x y z" at 0 and 4 -> diagonal-4 run pa=4,5 -> 3
      (3L, "x y z q x y z"))
      .toDF("doc_id", "text")
    val got = Dedup.longestSelfRepeat(corpus, "doc_id", "text", 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("longest_repeat")))).toMap
    assert(got(1L) == ((8L, 5L)), s"periodic: ${got(1L)}")
    assert(got(2L) == ((7L, 0L)), s"clean: ${got(2L)}")
    assert(got(3L) == ((7L, 3L)), s"disjoint: ${got(3L)}")
  }

  test("jaccardPairs: exact dup scores 1.0, blocking excludes cross-block pairs") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source", 2, 0.0)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-12)
    assert(pairs.get((1L, 3L)).exists(j => j > 0.5 && j < 1.0))
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L }) // other block
  }

  test("contaminationBloom: identical result to the exact contamination scan") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", true),
      (2L, "eta theta iota kappa lambda mu", true))
    val test = Seq(
      (100L, "alpha beta gamma delta unrelated words", false), // leaks 2 3-grams
      (101L, "totally clean held out document here", false),
      (102L, "iota kappa lambda mu nu xi", false)) // leaks 2 3-grams
    val corpus = (train ++ test).toDF("doc_id", "text", "is_train")
    val exact = Dedup.contamination(corpus, "doc_id", "text", $"is_train", 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_sh"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("contamination"))).toSet
    val bloomed = Dedup.contaminationBloom(corpus, "doc_id", "text", $"is_train", 3,
        expectedItems = 100, fpp = 0.01)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_sh"),
        r.getAs[Long]("n_shared"), r.getAs[Double]("contamination"))).toSet
    assert(bloomed === exact)
    assert(exact.map(_._1) === Set(100L, 102L))
  }

  test("contamination ≡ contaminationBloom on NULL-id test docs (both drop them)") {
    // ADVICE r10: the exact path joins on sh and groups by doc_id, so a
    // NULL-id test doc with shared shingles emitted a row the Bloom path
    // (which filters doc_id IS NOT NULL) did not — the IDENTICAL contract
    // broke exactly there. Both paths must now drop the NULL-id doc.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", true),
      (100L, "alpha beta gamma delta unrelated words", false),
      (999L, "alpha beta gamma delta leaked via null id", false))
      .toDF("doc_id", "text", "is_train")
      .withColumn("doc_id",
        org.apache.spark.sql.functions.when($"doc_id" === 999L,
          org.apache.spark.sql.functions.lit(null).cast("long"))
          .otherwise($"doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (Option(r.get(0)), r.getAs[Long]("n_shared"))).toSet
    val exact = rows(Dedup.contamination(corpus, "doc_id", "text", $"is_train", 3))
    val bloomed = rows(Dedup.contaminationBloom(corpus, "doc_id", "text",
      $"is_train", 3, expectedItems = 100, fpp = 0.01))
    assert(exact === bloomed)
    assert(exact.forall(_._1.nonEmpty), "NULL-id docs must not emit rows")
    assert(exact.map(_._1).flatten === Set(100L))
  }

  test("duplicatedSpans: shared prefix covers exactly its span; full dups merge to 1.0") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"), // shares 5-gram "a b c d e" with doc 2
      (2L, "a b c d e z1 z2 z3 z4 z5"),
      (3L, "q r s t u v w x y yy"), // no shared grams
      (4L, "m n o p q2 r2 s2 t2 u2 v2 w2 x2"), // exact dup of 5: merged full cover
      (5L, "m n o p q2 r2 s2 t2 u2 v2 w2 x2"),
      (6L, "one two")) // shorter than n: zero grams, zero coverage
      .toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(corpus, "doc_id", "text", 5)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_dup_grams"),
          x.getAs[Long]("n_cov_tokens"), x.getAs[Double]("dup_frac")))).toMap
    assert(r(1L) === ((6L, 1L, 5L, 0.5)))
    assert(r(2L) === ((6L, 1L, 5L, 0.5)))
    assert(r(3L) === ((6L, 0L, 0L, 0.0)))
    assert(r(4L) === ((8L, 8L, 12L, 1.0)))
    assert(r(5L) === ((8L, 8L, 12L, 1.0)))
    assert(r(6L) === ((0L, 0L, 0L, 0.0)))
  }

  /** Token positions covered by a span frame (doc_id, span_start, span_len). */
  private def coverage(spans: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    spans.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.flatMap { r =>
      val s = r.getAs[Long]("span_start")
      s until (s + r.getAs[Long]("span_len"))
    }.toSet).toMap.withDefaultValue(Set.empty)

  test("maximalMatchSpans: exact match found with its true maximal extent") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"), // shares the 6-token run "a b c d e f" with 2
      (2L, "a b c d e f z1 z2 z3 z4"),
      (3L, "q r s t u v w x y yy")) // no shared grams
      .toDF("doc_id", "text")
    val r = Dedup.maximalMatchSpans(corpus, "doc_id", "text", 5).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("span_start"),
        x.getAs[Long]("span_len"), x.getAs[Long]("n_matches"))).toSet
    // two dup grams chain into ONE maximal 6-token match per doc
    assert(r === Set((1L, 0L, 6L, 1L), (2L, 0L, 6L, 1L)))
  }

  test("maximalMatchSpans: adjacent matches with DIFFERENT partners stay " +
      "separate spans where the shingle stand-in over-merges") {
    val corpus = Seq(
      (1L, "a1 a2 a3 a4 a5 x1 x2 x3 x4 x5"), // partner for docX's first half
      (2L, "b1 b2 b3 b4 b5 y1 y2 y3 y4 y5"), // partner for docX's second half
      (3L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5")) // A-half || B-half, token-adjacent
      .toDF("doc_id", "text")
    val chained = Dedup.maximalMatchSpans(corpus, "doc_id", "text", 5).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("span_start"),
        x.getAs[Long]("span_len"))).toSet
    // doc 3: two maximal matches [0,4] (with doc 1) and [5,9] (with doc 2)
    // that touch but do not intersect -> two rows, NOT one [0,9] span
    // (the "a2..b1" boundary grams occur nowhere else, so no single
    // partner supports a contiguous 10-token match)
    assert(chained === Set((1L, 0L, 5L), (2L, 0L, 5L),
      (3L, 0L, 5L), (3L, 5L, 5L)))
    val standIn = Dedup.duplicatedSpanList(corpus, "doc_id", "text", 5).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("span_start"),
        x.getAs[Long]("span_len"))).toSet
    // the stand-in's adjacency merge reports ONE 10-token doc-3 "span"
    // that is contiguous nowhere else in the corpus — the documented gap
    assert(standIn.contains((3L, 0L, 10L)))
  }

  test("trimMaximalMatches keep-one: lower-id copy survives, higher-id side " +
      "trimmed; match-granular keeper differs from the gram keeper") {
    val corpus = Seq(
      (1L, "a1 a2 a3 a4 a5 x1 x2 x3 x4 x5"),
      (2L, "b1 b2 b3 b4 b5 y1 y2 y3 y4 y5"),
      (3L, "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5")) // matches 1 (A-half) and 2 (B-half)
      .toDF("doc_id", "text")
    val r = Dedup.trimMaximalMatches(corpus, "doc_id", "text", 5,
        keepLowestId = true).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_kept"), x.getAs[String]("trimmed_text")))).toMap
    // docs 1 and 2 are the lower-id exemplars of their matches: intact
    assert(r(1L) === ((10L, "a1 a2 a3 a4 a5 x1 x2 x3 x4 x5")))
    assert(r(2L) === ((10L, "b1 b2 b3 b4 b5 y1 y2 y3 y4 y5")))
    // doc 3 is the higher-id side of BOTH matches: fully excised — and
    // every removed token survives verbatim in the partner it matched
    assert(r(3L) === ((0L, "")))
  }

  test("maximalMatchSpans coverage equals the shingle stand-in's (uncapped)") {
    // Uncapped, the two operators flag the SAME token positions — every
    // duplicated-gram occurrence sits inside >=1 pairwise match and vice
    // versa; they differ only in how positions group into spans. Run on
    // the ng-family corpus: sf0.001 documents plus the injected twin
    // excerpts, so the property is exercised on real data, not a toy.
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val toks = graft.operators.TextFunctions.tokens(
      org.apache.spark.sql.functions.col("text"))
    val excerpts = docs
      .filter(org.apache.spark.sql.functions.col("doc_id") % 9 === 0 &&
        org.apache.spark.sql.functions.size(toks) >= 30)
      .select((org.apache.spark.sql.functions.col("doc_id") + 20000000L).as("doc_id"),
        org.apache.spark.sql.functions.concat_ws(" ",
          org.apache.spark.sql.functions.slice(toks, 6, 20)).as("text"))
    val corpus = docs.unionByName(excerpts)
    val chainCov = coverage(Dedup.maximalMatchSpans(corpus, "doc_id", "text", 5,
      maxOccPerGram = Int.MaxValue).collect())
    val standCov = coverage(Dedup.duplicatedSpanList(corpus, "doc_id", "text", 5)
      .collect())
    assert(chainCov.keySet == standCov.keySet)
    chainCov.keySet.foreach { id =>
      assert(chainCov(id) == standCov(id), s"coverage diverges for doc $id")
    }
    assert(chainCov.nonEmpty) // non-vacuous: the injected twins guarantee spans
  }
}
