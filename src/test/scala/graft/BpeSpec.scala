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
}
