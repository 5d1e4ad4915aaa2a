package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (100L, 1L, 10L, 1.0), // matches right ts=10 (inclusive <=)
    (101L, 1L, 20L, 2.0), // matches right ts=15
    (102L, 1L, 5L, 3.0),  // before every right row -> NULLs
    (103L, 2L, 7L, 4.0)   // user 2 has no right rows at/before 7 -> NULLs
  ).toDF("event_id", "user_id", "ts", "value")

  private def right = Seq(
    (200L, 1L, 10L, 11.0), // ties with 201 on (user, ts); 200 < 201 wins
    (201L, 1L, 10L, 12.0),
    (202L, 1L, 15L, 13.0),
    (203L, 2L, 99L, 14.0)
  ).toDF("event_id", "user_id", "ts", "value")

  private def run = AsOfJoin.asOf(left, right, Seq("user_id"), "ts",
    payload = Seq("value", "event_id"), tieCol = "event_id")

  test("most recent at-or-before right row attaches; misses stay NULL") {
    val got = run
      .select("event_id", "r_ts", "r_value", "r_event_id")
      .as[(Long, Option[Long], Option[Double], Option[Long])]
      .collect().sortBy(_._1)
    assert(got(0) === ((100L, Some(10L), Some(11.0), Some(200L)))) // inclusive + tie -> min event_id
    assert(got(1) === ((101L, Some(15L), Some(13.0), Some(202L))))
    assert(got(2) === ((102L, None, None, None)))
    assert(got(3) === ((103L, None, None, None)))
  }

  test("every left row survives exactly once and keeps its columns") {
    val out = run
    assert(out.count() === 4)
    assert(out.columns.toSeq ===
      Seq("event_id", "user_id", "ts", "value", "r_ts", "r_value", "r_event_id"))
    assert(out.select(sum("value")).as[Double].head() === 10.0)
  }

  test("no join operator in the plan — the union+window shape") {
    val plan = run.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("empty right side: all left rows survive with NULL payloads") {
    val out = AsOfJoin.asOf(left, right.filter(col("ts") < 0),
      Seq("user_id"), "ts", Seq("value", "event_id"), "event_id")
    assert(out.count() === 4)
    assert(out.filter(col("r_ts").isNotNull).count() === 0)
  }

  test("empty left side: empty result, schema intact") {
    val out = AsOfJoin.asOf(left.filter(col("ts") < 0), right,
      Seq("user_id"), "ts", Seq("value", "event_id"), "event_id")
    assert(out.count() === 0)
    assert(out.columns.toSeq ===
      Seq("event_id", "user_id", "ts", "value", "r_ts", "r_value", "r_event_id"))
  }

  test("result is stable under input repartitioning") {
    val a = run.collect().map(_.toString).sorted
    val b = AsOfJoin.asOf(left.repartition(5), right.repartition(3),
        Seq("user_id"), "ts", Seq("value", "event_id"), "event_id")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
