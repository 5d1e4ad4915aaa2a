package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Byte-pair-encoding tokenizer training and application — the tokenizer
  * step of an LLM data pipeline (GPT-2-style word-internal merges).
  *
  * Scale decomposition (why this survives 100 TB):
  *
  *  1. The CORPUS is touched exactly ONCE: a hash aggregation to the word
  *     frequency table. Classic BPE (Sennrich et al. 2016) operates
  *     entirely on (word, freq) afterwards — distinct words are orders of
  *     magnitude smaller than the corpus.
  *  2. Training runs on the DRIVER over a BOUNDED top-`maxVocab` slice of
  *     that table (TakeOrderedAndProject — the same bounded-training /
  *     full-scan-inference split as the IVF quantizer). BPE merge rounds
  *     are inherently sequential; looping on ≤ 10⁵ in-memory rows beats
  *     paying a job latency per round by orders of magnitude, and the
  *     frequency cap is what production trainers do anyway.
  *  3. Tokenization (`tokenize`) is a pure narrow map over the corpus
  *     with the merge ranks broadcast in the closure — no shuffle, no
  *     state. Applying ranked merges to one word is inherently
  *     imperative, so it runs as a typed lambda (the same boundary
  *     argument as the Wilcoxon exact-CDF UDF: per-record CPU work with
  *     no plan-shape consequence).
  *
  * Ties in pair counts break by pair text ascending — training is
  * deterministic across partitionings, retries, and engines.
  */
object Bpe {

  private val log = LoggerFactory.getLogger(getClass)

  /** Learned merge table: `rank` = merge order (0 first), `left`+`right`
    * concatenate to the new symbol. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Word-frequency table from a document column: ONE corpus pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` merges over a (word, freq) frame.
    *
    * The cluster's job ends at the word-frequency table; training itself
    * runs on the DRIVER over the top-`maxVocab` words by frequency
    * (TakeOrderedAndProject — bounded collect, the IVF-quantizer
    * precedent). This is how production BPE trainers work
    * (sentencepiece/HF cap the training vocabulary): the rare tail
    * contributes negligible pair mass, and a driver loop over ≤ 10⁵
    * (word, freq) rows runs 30 merge rounds at memory speed, where a
    * per-round distributed aggregation would pay 30 job latencies to
    * count pairs of a vocab-sized frame.
    *
    * Stops early when no adjacent pair occurs twice (merging singletons
    * is pure vocab bloat). Ties break by (count desc, pair asc) —
    * deterministic across partitionings and engines. */
  def fit(wordFreq: DataFrame, numMerges: Int,
      maxVocab: Int = 100000): Seq[Merge] = {
    val top = wordFreq
      .select(col("word").cast("string"), col("freq").cast("long"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocab)
      .collect()
    var words: Array[(Seq[String], Long)] =
      top.map(r => (codePointSymbols(r.getString(0)), r.getLong(1)))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < 2) done = true
        else {
          merges += Merge(round, l, r)
          words = words.map { case (syms, f) => (mergeOnce(syms, l, r), f) }
          round += 1
        }
      }
    }
    log.info(s"bpe fit: ${merges.size} merges (requested $numMerges) " +
      s"over ${words.length} training words")
    merges.toSeq
  }

  /** One left-to-right pass replacing every adjacent (l, r) with l+r —
    * the standard BPE apply step (a merged symbol cannot overlap the
    * pair that produced it within the same pass). */
  private[graft] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Symbol init by CODE POINT, not UTF-16 char: `map(_.toString)`
    * would split surrogate pairs (emoji, astral CJK) into lone
    * surrogates that corrupt to U+FFFD on write unless a merge happens
    * to rejoin them. Fit and apply must split identically. */
  private[graft] def codePointSymbols(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Apply ranked merges to one word: repeatedly merge the
    * lowest-ranked pair present until none applies. */
  private[graft] def applyMerges(word: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = codePointSymbols(word)
    var continue = syms.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else {
        val m = merges2(syms, bi)
        syms = m
        continue = syms.length >= 2
      }
    }
    syms
  }

  private def merges2(syms: Seq[String], at: Int): Seq[String] =
    (syms.take(at) :+ (syms(at) + syms(at + 1))) ++ syms.drop(at + 2)

  /** Tokenize a document column with learned merges: narrow map, merge
    * ranks broadcast in the closure, one output row per (doc, token
    * position). */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    // null text (and null/uncastable ids) are outside the tokenizer's
    // domain: tokens() of NULL decodes to a null Seq and the flatMap
    // would NPE mid-task — filter them like wordCounts' explode does
    docs.filter(col(textCol).isNotNull && col(idCol).cast("long").isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("words"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, ws) =>
        var pos = 0L
        ws.iterator.flatMap { w =>
          applyMerges(w, bRanks.value).iterator.map { t =>
            pos += 1; (id, pos, t)
          }
        }
      }
      .toDF("doc_id", "pos", "bpe_token")
  }
}
