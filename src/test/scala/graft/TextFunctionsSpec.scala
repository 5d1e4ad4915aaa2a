package graft

import org.apache.spark.sql.functions._
import graft.operators.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens and shingles") {
    val df = Seq("The quick  brown fox").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
    val toks = df.select("t").as[Seq[String]].collect().head
    assert(toks == Seq("the", "quick", "brown", "fox"))
    val sh = df.select(TextFunctions.shingles(col("t"), 2).as("s"))
      .as[Seq[String]].collect().head
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
  }

  test("shingles shorter than n give an empty array, not a broken sequence") {
    val df = Seq("one two").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("s"))
    assert(df.as[Seq[String]].collect().head.isEmpty)
  }

  test("quality heuristics on a known sentence") {
    val df = Seq("the cat sat on the mat!!").toDF("text")
      .select(
        TextFunctions.meanWordLen(col("text")).as("mwl"),
        TextFunctions.punctRatio(col("text")).as("pr"),
        TextFunctions.stopwordRatio(col("text"), Seq("the", "on")).as("sr"))
    val r = df.collect().head
    // tokens: the cat sat on the mat!! -> lengths 3,3,3,2,3,5 = 19/6
    assert(math.abs(r.getAs[Double]("mwl") - 19.0 / 6) < 1e-12)
    assert(math.abs(r.getAs[Double]("pr") - 2.0 / 24) < 1e-12)
    assert(math.abs(r.getAs[Double]("sr") - 3.0 / 6) < 1e-12)
  }

  test("codegen scalar gates equal the HOF forms they replaced, on nasty inputs") {
    // tokenMatchCount / meanWordLen went regex-arithmetic in r10 so the
    // scan stage stays in ONE codegen span (HOF lambdas are
    // CodegenFallback). Equality with the lambda forms must hold on every
    // shape that ever bit a tokenizer: adjacent stopwords, leading tabs
    // (tokens() yields a leading "" there), repeated runs of whitespace,
    // empty / whitespace-only text (the documented [""] quirk), words as
    // substrings of bigger words, and the stopword at both ends.
    val texts = Seq(
      "the the the", "a a", "\tthe cat", "the  cat \n the", "", "   ",
      "theater a cathedral", "a", "to the to", "x to", "to x",
      "mixed CASE The tHe the")
    val words = Seq("the", "a", "to")
    val df = texts.toDF("text")
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .select(
        TextFunctions.tokenMatchCount(col("text"), words).as("fast"),
        size(filter(col("toks"), t => t.isin(words.map(lit): _*))).as("hof"),
        TextFunctions.meanWordLen(col("text")).as("mwl_fast"),
        (aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(col("toks"))).as("mwl_hof"))
    df.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"tokenMatchCount mismatch: $r")
      val (a, b) = (r.getDouble(2), r.getDouble(3))
      assert(a == b || (a.isNaN && b.isNaN), s"meanWordLen mismatch: $r")
    }
  }

  test("quality band thresholds and NULL propagation") {
    val df = Seq(
      (Some(3L), 0.0, 0.5), (Some(100L), 0.5, 0.5),
      (Some(100L), 0.1, 0.0), (Some(100L), 0.1, 0.2))
      .toDF("n", "p", "s")
      .select(TextFunctions.qualityBand(col("n"), col("p"), col("s")).as("b"))
    assert(df.as[String].collect().toSeq ==
      Seq("too_short", "too_noisy", "low_signal", "ok"))
  }

  test("scrubPii replaces emails, phones, IPs; piiCount agrees") {
    val cases = Seq(
      ("write to alice.smith+spam@sub.example.co.uk today",
        "write to <EMAIL> today", 1L),
      ("call +1 555-123-4567 or (212) 555-0199 now",
        "call <PHONE> or <PHONE> now", 2L),
      ("host 192.168.0.1 and 10.0.0.255 are up",
        "host <IP> and <IP> are up", 2L),
      ("mixed: bob@x.io at 10.1.2.3 call 555 123 4567",
        "mixed: <EMAIL> at <IP> call <PHONE>", 3L),
      ("nothing sensitive here at all", "nothing sensitive here at all", 0L))
    val got = cases.map(_._1).toDF("t")
      .select(TextFunctions.scrubPii(col("t")).as("s"),
        TextFunctions.piiCount(col("t")).cast("long").as("n"))
      .as[(String, Long)].collect()
    cases.zip(got).foreach { case ((in, wantS, wantN), (s, n)) =>
      assert(s === wantS, in)
      assert(n === wantN, in)
    }
  }

  test("fingerprints are deterministic and prefix-stable") {
    val df = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "alpha beta gamma delta epsilon zeta eta theta iota DIFFERENT")
      .toDF("text").withColumn("toks", TextFunctions.tokens(col("text")))
      .select(TextFunctions.prefixFingerprint(col("toks"), 8).as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1)) // first 8 tokens identical
  }
}
