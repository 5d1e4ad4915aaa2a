package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Event, EventStreams}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  test("windowed counts with watermark drop data later than the watermark") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(src.toDF(), watermark = "2 minutes",
        windowLen = "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1, ts(1), "click", 1.0), Event(2, ts(3), "click", 2.0))
      q.processAllAvailable()
      // advance watermark far past the first window -> it finalizes
      src.addData(Event(1, ts(20), "click", 1.0))
      q.processAllAvailable()
      // this row is now far behind the watermark -> must be DROPPED
      src.addData(Event(3, ts(2), "click", 100.0))
      q.processAllAvailable()
      src.addData(Event(1, ts(40), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("win_start", "n", "total_value").collect()
      val first = rows.find(_.getTimestamp(0) == ts(0)).get
      assert(first.getLong(1) == 2L) // late row not counted
      assert(math.abs(first.getDouble(2) - 3.0) < 1e-12)
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on event-time gap") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionize(src.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1, ts(1), "a", 1.0), Event(1, ts(1, 30), "b", 2.0))
      q.processAllAvailable()
      // 10 minutes later: watermark passes, user 1's session times out
      src.addData(Event(2, ts(11), "a", 5.0))
      q.processAllAvailable()
      src.addData(Event(2, ts(30), "a", 5.0))
      q.processAllAvailable()
      val s = spark.table("sessions").as[graft.streaming.UserSession].collect()
        .filter(_.userId == 1L)
      assert(s.length == 1)
      assert(s.head.nEvents == 2 && math.abs(s.head.totalValue - 3.0) < 1e-12)
      assert(s.head.start == ts(1) && s.head.end == ts(1, 30))
    } finally q.stop()
  }

  test("batch sessionization splits on gap and emits every session") {
    val events = Seq(
      Event(1, ts(1), "a", 1.0), Event(1, ts(1, 30), "b", 1.0), // session 1
      Event(1, ts(10), "c", 1.0), // gap > 60s -> session 2
      Event(2, ts(5), "a", 9.0)).toDS()
    val got = EventStreams.sessionize(events, gapSeconds = 60)
      .collect().sortBy(s => (s.userId, s.start.getTime))
    assert(got.length == 3)
    assert(got(0).nEvents == 2 && got(1).nEvents == 1 && got(2).userId == 2L)
  }

  test("nanosToTs converts the events.parquet epoch-nanos column") {
    val df = Seq(1767261600000000000L).toDF("ts_nanos")
      .select(EventStreams.nanosToTs($"ts_nanos").as("t"))
    assert(df.collect().head.getTimestamp(0) == Timestamp.valueOf("2026-01-01 10:00:00"))
  }
}
