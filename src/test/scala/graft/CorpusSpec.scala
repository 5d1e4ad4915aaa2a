package graft

import graft.api.Corpus
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog and runs to the field again"
  private lazy val docs = Seq(
    (1L, good),
    (2L, good), // exact dup of 1 -> dropped, keeper 1
    (3L, good + " with one extra tail phrase appended here"), // near dup
    (4L, "!!! ??? ### $$$ %%% ^^^"), // too_noisy
    (5L, "tiny"), // too_short
    (6L, "completely different content about spark catalyst engines and the planner"))
    .toDF("doc_id", "text")

  test("scored: bands separate keepers from noise and shorts") {
    val bands = Corpus.scored(docs).select("doc_id", "band")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bands(1L) == "ok" && bands(6L) == "ok")
    assert(bands(4L) == "too_noisy" && bands(5L) == "too_short")
  }

  test("cleaned: quality gate + exact dedup keep-min in one pass") {
    val kept = Corpus.cleaned(docs)
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 6L)) // 2 deduped into 1; 4,5 rejected
    val copies = kept.filter($"doc_id" === 1L)
      .select("n_copies").as[Long].head()
    assert(copies == 2L)
    assert(kept.columns.contains("band") && kept.columns.contains("n_tokens"))
  }

  test("nearDuplicates: exact-dup pair at jaccard 1.0; strangers absent") {
    val pairs = Corpus.nearDuplicates(docs, jaccardMin = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1.0)
    assert(pairs.keySet.flatMap(p => Set(p._1, p._2)).intersect(Set(6L)).isEmpty)
  }

  test("fingerprinted: identical prefixes share prefix_fp; distinct texts differ") {
    val fp = Corpus.fingerprinted(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L)._1 == fp(3L)._1) // same first 8 tokens -> same prefix fp
    assert(fp(1L) != fp(6L))
  }

  test("searchTopKApprox with nProbe = cells equals the exact search") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") % 100 === 0)
    val exact = Corpus.searchTopK(emb, q, topK = 3)
    val approx = Corpus.searchTopKApprox(emb, q, topK = 3, cells = 8, nProbe = 8)
    assert(approx.exceptAll(exact).count() == 0 && exact.exceptAll(approx).count() == 0)
  }
}
