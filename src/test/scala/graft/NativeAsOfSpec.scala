package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

import graft.operators.AsOfJoin
import graft.plans.NativeAsOf

class NativeAsOfSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(77L + i)))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => if (v == null) "∅" else v.toString)
      .mkString("|")).sorted.toSeq

  test("parity with the union+window composition on generated event sets") {
    val gen = for {
      nl <- Gen.chooseNum(0, 40)
      nr <- Gen.chooseNum(0, 40)
      ls <- Gen.listOfN(nl, for {
        k <- Gen.chooseNum(1L, 4L); ts <- Gen.chooseNum(0L, 20L)
      } yield (k, ts))
      rs <- Gen.listOfN(nr, for {
        k <- Gen.chooseNum(1L, 4L); ts <- Gen.chooseNum(0L, 20L)
        v <- Gen.chooseNum(0.0, 9.0)
      } yield (k, ts, v))
    } yield (ls, rs)
    samples(gen, 8).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("lid", "user_id", "ts_us").repartition(5)
      val right = rs.zipWithIndex
        .map { case ((k, ts, v), i) => (k, ts, v, i.toLong) }
        .toDF("user_id", "ts_us", "value", "event_id").repartition(3)
      val a = AsOfJoin.asOf(left, right, Seq("user_id"), "ts_us",
        payload = Seq("value", "event_id"), tieCol = "event_id")
      // both physical paths must match the composition: broadcast (the
      // default pick on this tiny right side) and the sorted merge
      // (forced by disabling broadcast)
      val b = NativeAsOf.asOf(left, right, Seq("user_id"), "ts_us",
        payload = Seq("value", "event_id"), tieCol = "event_id")
      b.columns.toSeq shouldBe a.columns.toSeq
      canon(b) shouldBe canon(a)
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val c = NativeAsOf.asOf(left, right, Seq("user_id"), "ts_us",
          payload = Seq("value", "event_id"), tieCol = "event_id")
        canon(c) shouldBe canon(a)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("left-outer nulls before the first right row; inclusive <=; min-tie wins") {
    val left = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 15L), (4L, 2L, 5L))
      .toDF("lid", "k", "ts")
    val right = Seq(
      (1L, 10L, "a", 7L), (1L, 10L, "b", 3L), // tie at ts 10 → event 3 wins
      (1L, 12L, "c", 1L))
      .toDF("k", "ts", "tag", "eid")
    val out = NativeAsOf.asOf(left, right, Seq("k"), "ts",
        payload = Seq("tag", "eid"), tieCol = "eid")
      .orderBy("lid").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("r_tag"))) // ts 5: nothing at-or-before
    out(1).getAs[String]("r_tag") shouldBe "b" // inclusive ts 10, min tie
    out(1).getAs[Long]("r_eid") shouldBe 3L
    out(2).getAs[String]("r_tag") shouldBe "c" // most recent (ts 12)
    assert(out(3).isNullAt(out(3).fieldIndex("r_tag"))) // key 2 has no right rows
  }

  test("multi-key join and empty right side") {
    val left = Seq(("a", 1L, 10L, 100L), ("b", 1L, 10L, 101L))
      .toDF("g", "k", "ts", "lid")
    val right = Seq(("a", 1L, 8L, 0.5, 1L))
      .toDF("g", "k", "ts", "v", "eid")
    val out = NativeAsOf.asOf(left, right, Seq("g", "k"), "ts",
        payload = Seq("v"), tieCol = "eid")
      .orderBy("lid").collect()
    out(0).getAs[Double]("r_v") shouldBe 0.5
    assert(out(1).isNullAt(out(1).fieldIndex("r_v"))) // ("b",1) never matches ("a",1)
    val empty = right.filter(lit(false))
    NativeAsOf.asOf(left, empty, Seq("g", "k"), "ts",
      payload = Seq("v"), tieCol = "eid").count() shouldBe 2L
  }

  test("plans as AsOfJoinExec: co-partitioned children, no union, no window") {
    val left = (1 to 500).map(i => (i.toLong, (i % 7).toLong, (i % 50).toLong))
      .toDF("lid", "k", "ts")
    val right = (1 to 300).map(i => ((i % 7).toLong, (i % 40).toLong, i.toLong))
      .toDF("k", "ts", "eid")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = NativeAsOf.asOf(left, right, Seq("k"), "ts",
        payload = Seq("eid"), tieCol = "eid")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin"), p) // nodeName strips the Exec suffix
      assert(!p.contains("Window") && !p.contains("Union"), p)
      // EnsureRequirements placed one hash exchange per side on the keys
      assert("hashpartitioning\\(k".r.findAllIn(p).size >= 2, p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("string keys and string ts: non-primitive orderings and held-state copies") {
    // exercises UTF8String comparisons in the key/ts orderings and the
    // ownTs defensive copy (a held UTF8String must not alias a reused
    // sorter buffer) — ISO strings sort like the instants they encode
    val left = Seq(
      ("alice", "2026-01-03", 1L), ("alice", "2026-01-07", 2L),
      ("bob", "2026-01-05", 3L), ("carol", "2026-01-02", 4L))
      .toDF("name", "day", "lid")
    val right = Seq(
      ("alice", "2026-01-01", 10.0, 1L), ("alice", "2026-01-05", 20.0, 2L),
      ("bob", "2026-01-05", 30.0, 3L), ("dave", "2026-01-01", 99.0, 4L))
      .toDF("name", "day", "v", "eid")
    for (threshold <- Seq("10MB", "-1")) { // broadcast AND merge paths
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        val out = NativeAsOf.asOf(left, right, Seq("name"), "day",
            payload = Seq("v"), tieCol = "eid")
          .orderBy("lid").collect()
        out(0).getAs[Double]("r_v") shouldBe 10.0 // jan 3 ← jan 1
        out(1).getAs[Double]("r_v") shouldBe 20.0 // jan 7 ← jan 5
        out(2).getAs[Double]("r_v") shouldBe 30.0 // inclusive same-day
        assert(out(3).isNullAt(out(3).fieldIndex("r_v"))) // carol: none
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("null ts never matches — composition and both native paths agree") {
    // null-ts RIGHT rows must be consumed-and-ignored (a stalled right
    // iterator would starve every later left row of the key); null-ts
    // LEFT rows keep NULL payloads
    val left = Seq(
      (1L, java.lang.Long.valueOf(10L), 100L),
      (1L, null.asInstanceOf[java.lang.Long], 101L),
      (1L, java.lang.Long.valueOf(20L), 102L))
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, null.asInstanceOf[java.lang.Long], 0.1, 1L),
      (1L, java.lang.Long.valueOf(5L), 0.5, 2L),
      (1L, java.lang.Long.valueOf(15L), 1.5, 3L))
      .toDF("k", "ts", "v", "eid")
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val out = df.orderBy("lid").collect()
      out(0).getAs[Double]("r_v") shouldBe 0.5 // ts 10 ← ts 5
      assert(out(1).isNullAt(out(1).fieldIndex("r_v"))) // null left ts
      out(2).getAs[Double]("r_v") shouldBe 1.5 // ts 20 ← ts 15
    }
    check(AsOfJoin.asOf(left, right, Seq("k"), "ts",
      payload = Seq("v"), tieCol = "eid"))
    for (threshold <- Seq("10MB", "-1")) {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        check(NativeAsOf.asOf(left, right, Seq("k"), "ts",
          payload = Seq("v"), tieCol = "eid"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("null tie wins the (key, ts) group on both physical paths") {
    // nulls-first tie order: a null tie sorts smallest, so its payload
    // beats a non-null tie at the same instant — the composition's
    // window orderBy convention, mirrored by both execs
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 10L, "loser", java.lang.Long.valueOf(5L)),
      (1L, 10L, "winner", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "ts", "tag", "eid")
    val want = AsOfJoin.asOf(left, right, Seq("k"), "ts",
      payload = Seq("tag"), tieCol = "eid").head().getAs[String]("r_tag")
    want shouldBe "winner"
    for (threshold <- Seq("10MB", "-1")) {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        NativeAsOf.asOf(left, right, Seq("k"), "ts",
          payload = Seq("tag"), tieCol = "eid")
          .head().getAs[String]("r_tag") shouldBe "winner"
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }

  test("mismatched key/ts types fail fast instead of corrupting silently") {
    val left = Seq((1, 10L, 1L)).toDF("k", "ts", "lid") // k: INT
    val right = Seq((1L, 5L, 0.5, 1L)).toDF("k", "ts", "v", "eid") // k: BIGINT
    val e1 = intercept[IllegalArgumentException] {
      NativeAsOf.asOf(left, right, Seq("k"), "ts",
        payload = Seq("v"), tieCol = "eid")
    }
    e1.getMessage should include("type mismatch")
    val right2 = Seq((1, 5, 0.5, 1L)).toDF("k", "ts", "v", "eid") // ts: INT
    val e2 = intercept[IllegalArgumentException] {
      NativeAsOf.asOf(left, right2, Seq("k"), "ts",
        payload = Seq("v"), tieCol = "eid")
    }
    e2.getMessage should include("type mismatch")
  }

  test("injected rule pushes left-side filters through the node to the scan") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", Tables.eventTsMicros)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts_us", "value", "event_id")
    val df = NativeAsOf.asOf(clicks, purchases, Seq("user_id"), "ts_us",
        payload = Seq("value"), tieCol = "event_id")
      .filter(col("user_id") < 50) // left-only predicate ABOVE the custom node
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the rule moved it below AsOfJoinPlan, and V1 parquet planning then
    // carried it into the scan — visible as a pushed filter, not a
    // post-join Filter over the joined output
    assert(p.contains("PushedFilters") && p.contains("LessThan(user_id,50)"), p)
    // parity: same rows as filtering after the composition
    val want = AsOfJoin.asOf(clicks, purchases, Seq("user_id"), "ts_us",
        payload = Seq("value"), tieCol = "event_id")
      .filter(col("user_id") < 50)
    canon(df.select(want.columns.map(col).toIndexedSeq: _*)) shouldBe canon(want)
  }

  test("injected pruning narrows the left scan through the node") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", Tables.eventTsMicros)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us", "value", "props")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts_us", "value", "event_id")
    val df = NativeAsOf.asOf(clicks, purchases, Seq("user_id"), "ts_us",
        payload = Seq("value"), tieCol = "event_id")
      .select("event_id", "r_value") // left value/props unused
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("props"), "unused left column still read:\n" + p)
    // keys + ts survive for the merge even though unprojected
    assert(p.contains("user_id"), p)
  }

  test("keyless (global) as-of delegates to the composition instead of failing") {
    // ClusteredDistribution(Nil) is unplannable, so empty keys fall back
    // to AsOfJoin.asOf's unpartitioned window (r5 advisor) — the two
    // entry points must accept the same inputs with the same semantics
    val left = Seq((1L, 10L), (2L, 25L), (3L, 4L)).toDF("lid", "ts")
    val right = Seq((5L, 100.0, 1L), (20L, 200.0, 2L)).toDF("ts", "v", "eid")
    val got = graft.plans.NativeAsOf.asOf(left, right, Seq.empty, "ts",
        payload = Seq("v"), tieCol = "eid")
      .orderBy("lid").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("r_v")))))
    assert(got === Array(
      (1L, Some(100.0)), // latest right at ts<=10 is ts=5
      (2L, Some(200.0)), // ts=20
      (3L, None)))       // no right row at or before ts=4
  }

  test("small right side picks BroadcastAsOfJoin: the fact is never shuffled") {
    val left = (1 to 500).map(i => (i.toLong, (i % 7).toLong, (i % 50).toLong))
      .toDF("lid", "k", "ts")
    val right = (1 to 50).map(i => ((i % 7).toLong, (i % 40).toLong, i.toLong))
      .toDF("k", "ts", "eid")
    val df = NativeAsOf.asOf(left, right, Seq("k"), "ts",
      payload = Seq("eid"), tieCol = "eid")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastAsOfJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("hashpartitioning"), "fact side took a shuffle:\n" + p)
    assert(!p.contains("Sort "), "fact side took a sort:\n" + p)
  }
}
