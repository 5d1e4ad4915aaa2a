package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE teaching fixture: freqs hug:3 pug:1 pun:1 bun:1
  private val corpus = Seq(
    (1L, "hug hug hug pug"),
    (2L, "pun bun"))
    .toDF("doc_id", "text")

  test("fit learns the hand-computed merge sequence (ug, h+ug, un)") {
    val wf = Bpe.wordCounts(corpus, "text")
    assert(wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("hug" -> 3L, "pug" -> 1L, "pun" -> 1L, "bun" -> 1L))
    val merges = Bpe.fit(wf, numMerges = 3)
    assert(merges.map(m => (m.left, m.right)) ===
      Seq(("u", "g"), ("h", "ug"), ("u", "n")))
    assert(merges.map(_.rank) === Seq(0, 1, 2))
  }

  test("early stop: no pair reaches count 2") {
    val wf = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    assert(Bpe.fit(wf, numMerges = 10).isEmpty)
  }

  test("tokenize applies ranked merges greedily, unseen chars stay atomic") {
    val merges = Seq(Bpe.Merge(0, "u", "g"), Bpe.Merge(1, "h", "ug"),
      Bpe.Merge(2, "u", "n"))
    val out = Bpe.tokenize(Seq((7L, "hugs bun")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("bpe_token")))
    assert(out === Array((1L, "hug"), (2L, "s"), (3L, "b"), (4L, "un")))
  }

  test("fit+tokenize round trip: corpus words compress to single tokens") {
    val merges = Bpe.fit(Bpe.wordCounts(corpus, "text"), numMerges = 10)
    val toks = Bpe.tokenize(corpus, "doc_id", "text", merges)
    // "hug" must have become one token (most frequent word merges first)
    val hugDoc = toks.filter($"doc_id" === 1L).collect().map(_.getString(2))
    assert(hugDoc.count(_ == "hug") == 3, hugDoc.mkString(","))
  }

  test("vocab cap keeps only the heaviest words in training") {
    val wf = Bpe.wordCounts(corpus, "text")
    // cap to 1 word: only "hug" (freq 3) trains; (h,u) and (u,g) tie at 3
    // and the pair-ascending tiebreak picks (h,u) first
    val merges = Bpe.fit(wf, numMerges = 10, maxVocab = 1)
    assert(merges.map(m => (m.left, m.right)) === Seq(("h", "u"), ("hu", "g")))
  }

  test("fit is deterministic across repartitionings") {
    val wf = Bpe.wordCounts(corpus, "text")
    assert(Bpe.fit(wf.repartition(7), 6) === Bpe.fit(wf.repartition(2), 6))
  }

  // ---- rank-order equivalence: the foundation of bp2b's SQL oracle ----

  /** Reference apply: each rank exhaustively, in rank order — ONE greedy
    * mergeOnce pass per rank (a pass leaves no (l, r) pair behind: the
    * merged symbol l+r can't re-form (l, r) with a neighbour since that
    * would need l+r to equal l or r). This is exactly what the bp2b
    * oracle's chained list_reduce folds compute in SQL. */
  private def applyByRankOrder(word: String, merges: Seq[Bpe.Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(Bpe.codePointSymbols(word)) {
      (syms, m) => Bpe.mergeOnce(syms, m.left, m.right)
    }

  /** Structural soundness of a merge list for rank-order application: a
    * later merge must never create a symbol an earlier-rank pair uses —
    * guaranteed when (a) concatenations are pairwise distinct (unique
    * creator per symbol) and (b) every pair member is a single code point
    * or the concatenation of a STRICTLY EARLIER merge. Trained lists have
    * this by construction; the assertion guards FrozenModels regeneration. */
  private def assertRankOrderSound(merges: Seq[Bpe.Merge]): Unit = {
    val ms = merges.sortBy(_.rank)
    val concats = ms.map(m => m.left + m.right)
    assert(concats.distinct.size == concats.size, "duplicate concatenation")
    ms.zipWithIndex.foreach { case (m, i) =>
      Seq(m.left, m.right).foreach { s =>
        val single = s.codePointCount(0, s.length) == 1
        val earlier = concats.take(i).contains(s)
        assert(single || earlier,
          s"rank ${m.rank}: symbol '$s' is neither atomic nor created earlier")
      }
    }
  }

  test("frozen checkpoint: rank-order apply == priority apply on random words") {
    val frozen = graft.queries.FrozenModels.bpeMerges.zipWithIndex
      .map { case ((l, r), i) => Bpe.Merge(i, l, r) }
    assertRankOrderSound(frozen)
    val ranks = frozen.map(m => (m.left, m.right) -> m.rank).toMap
    // alphabet biased toward the merge symbols so merges actually fire
    val alpha = frozen.flatMap(m => (m.left + m.right).toSeq).distinct ++
      Seq('q', 'z', '7', 'é')
    val rnd = new scala.util.Random(421)
    (1 to 2000).foreach { _ =>
      val w = Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(alpha.size))).mkString
      assert(Bpe.applyMerges(w, ranks) === applyByRankOrder(w, frozen),
        s"divergence on word '$w'")
    }
  }

  test("fitted lists are rank-order sound and equivalent on corpus words") {
    val merges = Bpe.fit(Bpe.wordCounts(corpus, "text"), numMerges = 10)
    assertRankOrderSound(merges)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val words = corpus.collect().flatMap(_.getString(1).split("\\s+"))
    words.foreach { w =>
      assert(Bpe.applyMerges(w, ranks) === applyByRankOrder(w, merges))
    }
  }
}
