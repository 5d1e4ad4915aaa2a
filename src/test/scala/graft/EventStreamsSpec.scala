package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, expr, lit, substring, timestamp_micros, window}
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

  test("nanosToTs converts an epoch-nanos long column exactly") {
    val df = Seq(1767261600000000000L).toDF("ts_nanos")
      .select(EventStreams.nanosToTs($"ts_nanos").as("t"))
    assert(df.collect().head.getTimestamp(0) == Timestamp.valueOf("2026-01-01 10:00:00"))
  }

  test("file-source stream: readStream over the events parquet matches batch") {
    // the real ingestion path: readStream -> transform -> writeStream,
    // over the driver-generated parquet, not a MemoryStream
    val sf = "/root/testdata/sf0.001"
    val batchEv = Tables.events(spark, sf).select(
      Tables.eventTs.as("ts"),
      col("event_type").as("eventType"), col("value"))
    val expect = EventStreams.windowedTypeCounts(batchEv, windowLen = "1 hour")
      .select("win_start", "eventType", "n", "total_value")
    // the file source wants a directory: stage the table file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    val streamEv = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .select(Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
    val q = EventStreams.windowedTypeCounts(streamEv, windowLen = "1 hour")
      .select("win_start", "eventType", "n", "total_value")
      .writeStream.format("memory").queryName("file_stream_win")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream_win")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
    } finally q.stop()
  }

  test("bloomSemiStatic: stream probe + semi join matches the batch semi join") {
    // the allowlist-firehose shape over micro-batches: the broadcast Bloom
    // probe prunes inside each micro-batch's scan, the stateless
    // stream-static LEFT SEMI join removes the fpp sliver — output must be
    // exactly the batch semi join, row for row
    val sf = "/root/testdata/sf0.001"
    val dict = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("user_id"))
    val expect = EventStreams.bloomSemiStatic(
      Tables.events(spark, sf).select("user_id", "event_id"), dict, "user_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_s10_in")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .select("user_id", "event_id")
    val q = EventStreams.bloomSemiStatic(stream, dict, "user_id")
      .writeStream.format("memory").queryName("s10_parity")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("s10_parity")
      assert(got.count() == expect.count())
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
      // and the prune is real: strictly fewer rows than the unfiltered feed
      assert(expect.count() < Tables.events(spark, sf).count())
    } finally q.stop()
  }

  test("spanCoverageStatic: append-mode stream matches the batch run row for row") {
    // the whole computation is per-row narrow expressions (exact
    // broadcast-set gram probes + an interval-merge fold), so the stream
    // needs NO state and NO watermark — micro-batch output must equal
    // the batch projection exactly
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val isTrain = substring(col("source"), 4, 10).cast("int") < 10
    val train = docs.filter(isTrain)
    val expect = EventStreams.spanCoverageStatic(
      docs.filter(!isTrain), train, "doc_id", "text", 3)
    // TWO disjoint input files + one file per trigger = two real
    // micro-batches: a single-file feed would be indistinguishable from
    // the batch run by construction, so cross-batch statelessness — the
    // claim under test — would never be exercised
    val dir = java.nio.file.Files.createTempDirectory("graft_s11_in")
    Seq(0, 1).foreach { half =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_s11_w$half")
      docs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        dir.resolve(s"half-$half.parquet"))
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .filter(!isTrain)
    val q = EventStreams.spanCoverageStatic(stream, train, "doc_id", "text", 3)
      .writeStream.format("memory").queryName("s11_parity")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("s11_parity")
      assert(got.count() == expect.count())
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
      // the signal is real: some doc has nonzero covered tokens
      assert(expect.filter(col("n_cov_tokens") > 0).count() > 0)
    } finally q.stop()
  }

  test("minhashHitsStatic: append-mode stream matches the batch run row for row") {
    // the signature is a per-row array_min projection and the probe a
    // stream-static inner join, so the stream needs NO state and NO
    // watermark — micro-batch output must equal the batch run exactly
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val isRef = substring(col("source"), 4, 10).cast("int") < 15
    val ref = docs.filter(isRef)
    val expect = EventStreams.minhashHitsStatic(
      docs.filter(!isRef), ref, "doc_id", "text", 3, 6, 2)
    // two disjoint files + one per trigger = two real micro-batches (the
    // s11 lesson: a single file cannot exercise cross-batch statelessness)
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_in")
    Seq(0, 1).foreach { half =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_s12_w$half")
      docs.filter(col("doc_id") % 2 === half).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        dir.resolve(s"half-$half.parquet"))
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .filter(!isRef)
    val q = EventStreams.minhashHitsStatic(stream, ref, "doc_id", "text", 3, 6, 2)
      .writeStream.format("memory").queryName("s12_parity")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val got = spark.table("s12_parity")
      assert(got.count() == expect.count())
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
      // the signal is real: the planted near-dups produce some hits...
      assert(expect.count() > 0)
      // ...and band hits are unique by construction (the no-state claim)
      assert(expect.count() ==
        expect.select("doc_id", "ref_id", "band").distinct().count())
    } finally q.stop()
  }

  test("minhashHitsStatic: per-row signature equals the batch groupBy(min) signature") {
    // value-identity of the two signature paths — min over the shingle
    // MULTISET (stream side, array_min over the exploded-gram array)
    // equals min over the shingle SET (batch side, distinct + groupBy)
    import graft.operators.Dedup
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf).limit(50)
    val batch = Dedup.minhashSignatures(
      Dedup.shingleRows(docs, "doc_id", "text", 3), 6)
    // recover the stream-side signatures by banding with bandsOf=1: bkey
    // = md5(h_i), so equality of all 6 band keys per doc pins all 6
    // signature components without exposing the private projection
    val streamBands = EventStreams.minhashHitsStatic(
      docs, docs, "doc_id", "text", 3, 6, 1, maxBucket = Int.MaxValue)
    // every doc must at least self-match on every band
    val selfHits = streamBands.filter(col("doc_id") === col("ref_id"))
    assert(selfHits.count() == batch.count() * 6)
  }

  test("spanCoverageStatic fold: overlap merges, touch merges, end clamps, full cover") {
    // hand-computed fixtures for the per-row interval-merge fold (n = 3):
    // the gaps-and-islands invariants ng1 pins with windows, pinned here
    // against absolute token positions
    val train = Seq((100L, "a b c x1 x2 c d e x3 x4 g h i")).toDF("doc_id", "text")
    // dictionary grams: every 3-gram of the train doc, incl. "a b c",
    // "c d e", "g h i"
    val tests = Seq(
      // [0..2] and [2..4] overlap at token 2 -> merged cover 5 of 6
      (1L, "a b c d e z"),
      // grams at [0..2] and [3..5]: ADJACENT spans (end 2, next start 3)
      // stay separate intervals but cover 6 of 7 tokens total
      (2L, "a b c g h i z"),
      // dup gram at the very end: span clamps at n_tok-1 -> cover 3 of 5
      (3L, "z1 z2 g h i"),
      // every token under some dup gram -> full cover, dup_frac 1.0
      (4L, "a b c d e"),
      // no dictionary grams at all -> zero row, not a dropped row
      (5L, "q r s t u v"))
      .toDF("doc_id", "text")
    val got = EventStreams.spanCoverageStatic(tests, train, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Long]("n_cov_tokens"), r.getAs[Double]("dup_frac")))).toMap
    assert(got(1L) == ((6L, 2L, 5L, 0.833333)), s"overlap: ${got(1L)}")
    assert(got(2L) == ((7L, 2L, 6L, 0.857143)), s"touch: ${got(2L)}")
    assert(got(3L) == ((5L, 1L, 3L, 0.6)), s"clamp: ${got(3L)}")
    assert(got(4L) == ((5L, 2L, 5L, 1.0)), s"full: ${got(4L)}")
    assert(got(5L) == ((6L, 0L, 0L, 0.0)), s"clean: ${got(5L)}")
  }

  test("freq_sketch state merges across micro-batches; stream matches batch") {
    val sf = "/root/testdata/sf0.001"
    val batchEv = Tables.events(spark, sf).select(
      Tables.eventTs.as("ts"),
      col("event_type").as("eventType"), col("value"))
    val expect = EventStreams.windowedFrequentTypes(batchEv, windowLen = "1 hour")
    // split the table into several files so the sketch buffers must
    // serialize into the state store and MERGE across micro-batches —
    // one file per trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mg")
    Tables.events(spark, sf).repartition(3)
      .write.mode("overwrite").parquet(dir.toString)
    val streamEv = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .select(Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
    val q = EventStreams.windowedFrequentTypes(streamEv, windowLen = "1 hour")
      .writeStream.format("memory").queryName("file_stream_mg")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream_mg")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"stream=${got.count()} batch=${expect.count()}")
    } finally q.stop()
  }

  test("sessionize: an in-gap straggler extends the session BACKWARD") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.sessionize(src.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_straggler")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1, ts(30), "a", 1.0))
      q.processAllAvailable()
      // late but inside both the watermark and the gap: the session must
      // now START at 10:20, not keep 10:30 (the batch-replay answer)
      src.addData(Event(1, ts(20), "b", 2.0))
      q.processAllAvailable()
      // push the watermark far past -> the session closes
      src.addData(Event(2, Timestamp.valueOf("2026-01-01 12:00:00"), "c", 0.0))
      q.processAllAvailable()
      val s1 = spark.table("sessions_straggler")
        .filter($"userId" === 1L).collect()
      assert(s1.length == 1)
      assert(s1.head.getAs[Timestamp]("start") == ts(20))
      assert(s1.head.getAs[Timestamp]("end") == ts(30))
      assert(s1.head.getAs[Long]("nEvents") == 2L)
    } finally q.stop()
  }

  test("sessionize: adjacent pre-session stragglers merge like a batch replay") {
    // the r6 interval-sweep rewrite (r5 advisor): gap-distant early
    // events must group among THEMSELVES, exactly as a batch replay
    // would, rather than each becoming a singleton. The true
    // straggler-behind-open-state path is unreachable through the public
    // API (watermark == gap drops such rows first — documented on
    // sessionize), so this exercises the same sweep in batch mode on
    // unsorted input: the early pair sits > gap before the late pair and
    // must come out as ONE two-event session.
    import spark.implicits._
    val events = Seq(
      Event(1, ts(50), "late", 1.0), // sweep state opens on the late pair
      Event(1, ts(55), "late", 1.0),
      Event(1, ts(1), "early", 1.0), // gap-distant early pair, adjacent
      Event(1, ts(2), "early", 1.0)).toDS()
    val got = EventStreams.sessionize(events, gapSeconds = 600)
      .collect().sortBy(_.start.getTime)
    assert(got.length == 2, got.mkString(", "))
    assert(got(0).start == ts(1) && got(0).end == ts(2) && got(0).nEvents == 2L)
    assert(got(1).start == ts(50) && got(1).end == ts(55) && got(1).nEvents == 2L)
  }

  test("windowed DDSketch histogram: stream matches batch across micro-batches") {
    val sf = "/root/testdata/sf0.001"
    val batchEv = Tables.events(spark, sf)
      .select(Tables.eventTs.as("ts"), col("value"))
    val expect = EventStreams.windowedValueSketch(batchEv, windowLen = "1 hour")
    // several files, one per trigger: per-(window, bucket) partial counts
    // must land in the state store and MERGE by addition
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dd")
    Tables.events(spark, sf).repartition(3)
      .write.mode("overwrite").parquet(dir.toString)
    val streamEv = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .select(Tables.eventTs.as("ts"), col("value"))
    val q = EventStreams.windowedValueSketch(streamEv, windowLen = "1 hour")
      .writeStream.format("memory").queryName("file_stream_dd")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream_dd")
      assert(got.except(expect).isEmpty && expect.except(got).isEmpty,
        s"stream=${got.count()} batch=${expect.count()}")
      // downstream serving step composes on the emitted histogram and its
      // estimates obey the sketch's relative-error bound per window
      val sel = graft.operators.Sketches.ddQuantilesOfHistogram(
        spark.table("file_stream_dd"), Seq("win_start"), 0.01,
        Seq(("p50", 0.5))).collect()
      val exact = batchEv.filter($"value" > 0)
        .groupBy(window($"ts", "1 hour")).agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("m"))
        .select($"window.start".as("w"), $"m").collect()
        .map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
      assert(sel.nonEmpty)
      sel.foreach { r =>
        val w = r.getTimestamp(0); val est = r.getAs[Double]("p50")
        val ex = exact(w)
        assert(math.abs(est - ex) / ex <= 0.0101,
          s"window $w: est $est vs exact $ex")
      }
    } finally q.stop()
  }

  test("parquet sink + checkpoint: stop/resume is exactly-once, partitions prunable") {
    val sf = "/root/testdata/sf0.001"
    val in = java.nio.file.Files.createTempDirectory("graft_eo_in")
    val out = java.nio.file.Files.createTempDirectory("graft_eo_out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eo_ckpt")
    val full = Tables.events(spark, sf)
    // first two thirds arrive, stream runs, stops
    val (a, b) = (full.filter(col("event_id") % 3 =!= 0),
      full.filter(col("event_id") % 3 === 0))
    a.write.parquet(s"$in/f1")
    def start() = spark.readStream
      .schema(full.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .partitionBy("event_type")
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // the remaining third lands while the stream is DOWN; the restart
    // must pick up exactly the unseen file — no replays, no gaps
    b.write.parquet(s"$in/f2")
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val sunk = spark.read.parquet(out.toString)
    assert(sunk.count() == full.count(), s"${sunk.count()} vs ${full.count()}")
    assert(sunk.select("event_id").distinct().count() == full.count(), "duplicates")
    // the layout is partition-prunable like any batch-written table
    val one = sunk.filter(col("event_type") === "click")
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(one.count() == full.filter(col("event_type") === "click").count())
  }

  test("hopping windows: every event lands in len/slide windows; stream matches batch") {
    val sf = "/root/testdata/sf0.001"
    val batchEv = Tables.events(spark, sf).select(
      Tables.eventTs.as("ts"),
      col("event_type").as("eventType"), col("value"))
    val hop = EventStreams.hoppingTypeCounts(batchEv,
      windowLen = "1 hour", slide = "30 minutes")
    // total multiplicity: sum n = 2 x events (1h len / 30min slide)
    val total = hop.agg(org.apache.spark.sql.functions.sum(col("n"))).collect()(0).getLong(0)
    assert(total == 2 * batchEv.count())
    // stream mode produces the same window set
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_hop")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-0.parquet"))
    val streamEv = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .parquet(dir.toString)
      .select(Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
    val q = EventStreams.hoppingTypeCounts(streamEv,
        windowLen = "1 hour", slide = "30 minutes")
      .writeStream.format("memory").queryName("file_stream_hop")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream_hop")
      assert(got.except(hop).isEmpty && hop.except(got).isEmpty)
    } finally q.stop()
  }

  test("dedupStream keeps first arrival, evicts key state past the watermark") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStreams.dedupStream(src.toDF(),
        keyCols = Seq("eventType", "value"), delay = "2 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1, ts(1), "click", 1.0), Event(2, ts(1, 30), "click", 1.0))
      q.processAllAvailable() // duplicate within watermark -> one survivor
      src.addData(Event(3, ts(2), "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2)
      // push the watermark far past (click, 1.0)'s state lifetime...
      src.addData(Event(4, ts(30), "buy", 3.0))
      q.processAllAvailable()
      // ...so a late duplicate is re-emitted: state was bounded, not global
      src.addData(Event(5, ts(31), "click", 1.0))
      q.processAllAvailable()
      val clicks = spark.table("deduped")
        .filter($"eventType" === "click").collect()
      assert(clicks.length == 2)
      assert(clicks.map(_.getAs[Long]("userId")).toSet == Set(1L, 5L))
    } finally q.stop()
  }

  test("streaming asOfEnrich: clicks pick up the latest preceding purchase") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStreams.asOfEnrich(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(1, ts(1), "click", 1.0)) // before any purchase
      purchases.addData(Event(1, ts(2), "purchase", 50.0))
      q.processAllAvailable()
      clicks.addData(Event(1, ts(3), "click", 2.0)) // after the purchase
      q.processAllAvailable()
      purchases.addData(Event(1, ts(4), "purchase", 70.0))
      clicks.addData(Event(1, ts(5), "click", 3.0), // sees the new ref
        Event(2, ts(5), "click", 4.0)) // other user: no purchases at all
      q.processAllAvailable()
      // late right row OLDER than the current ref must not regress it
      purchases.addData(Event(1, ts(3, 30), "purchase", 10.0))
      clicks.addData(Event(1, ts(6), "click", 5.0))
      q.processAllAvailable()
      val got = spark.table("asof_enrich")
        .as[graft.streaming.EnrichedEvent].collect()
        .map(e => e.value -> e.rValue).toMap
      assert(got(1.0).isEmpty)
      assert(got(2.0).contains(50.0))
      assert(got(3.0).contains(70.0))
      assert(got(4.0).isEmpty)
      assert(got(5.0).contains(70.0)) // not the late 10.0
    } finally q.stop()
  }

  test("batch asOfEnrich equals the AsOfJoin operator on the events table") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf).select(
      col("user_id").as("userId"), Tables.eventTs.as("ts"),
      col("event_type").as("eventType"), col("value")).as[Event]
    val enriched = EventStreams.asOfEnrich(
        ev.filter($"eventType" === "click"), ev.filter($"eventType" === "purchase"))
      .select($"userId", $"ts", $"value",
        $"rTs".as("r_ts"), $"rValue".as("r_value"))
    val evDf = Tables.events(spark, sf).withColumn("ts_us", Tables.eventTsMicros)
    val expect = graft.operators.AsOfJoin.asOf(
        evDf.filter($"event_type" === "click")
          .select($"user_id".as("userId"), $"ts_us", $"value"),
        evDf.filter($"event_type" === "purchase")
          .select($"user_id".as("userId"), $"ts_us", $"value"),
        Seq("userId"), "ts_us", payload = Seq("value"), tieCol = "value")
      .select($"userId", timestamp_micros($"ts_us").as("ts"), $"value",
        timestamp_micros($"r_ts_us").as("r_ts"), $"r_value")
    assert(enriched.except(expect).isEmpty && expect.except(enriched).isEmpty)
    assert(enriched.count() > 0)
  }

  test("intervalJoin: stream-stream join matches batch; late rows dropped") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = EventStreams.intervalJoin(clicks.toDF(), buys.toDF(),
        maxLag = "5 minutes", watermark = "2 minutes")
      .writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(1, ts(1), "click", 1.0), Event(2, ts(2), "click", 2.0))
      buys.addData(Event(1, ts(3), "purchase", 10.0), // in range for u1
        Event(2, ts(30), "purchase", 20.0)) // out of range for u2's click
      q.processAllAvailable()
      // advance both watermarks far past the first window
      clicks.addData(Event(9, ts(50), "click", 0.0))
      buys.addData(Event(9, ts(59), "purchase", 0.0))
      q.processAllAvailable()
      // a purchase this old is behind the watermark -> dropped, no match
      clicks.addData(Event(1, ts(2), "click", 7.0))
      buys.addData(Event(1, ts(4), "purchase", 70.0))
      q.processAllAvailable()
      val got = spark.table("ivj")
        .select("userId", "l_value", "r_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == Set((1L, 1.0, 10.0))) // u2 out-of-range, late pair dropped
    } finally q.stop()

    // batch twin over the same rows: plain range join, all pairs in range
    val all = Seq(Event(1, ts(1), "click", 1.0), Event(2, ts(2), "click", 2.0),
      Event(1, ts(2), "click", 7.0)).toDF()
    val rb = Seq(Event(1, ts(3), "purchase", 10.0),
      Event(2, ts(30), "purchase", 20.0),
      Event(1, ts(4), "purchase", 70.0)).toDF()
    val batch = EventStreams.intervalJoin(all, rb, maxLag = "5 minutes")
      .select("userId", "l_value", "r_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(batch == Set((1L, 1.0, 10.0), (1L, 1.0, 70.0),
      (1L, 7.0, 10.0), (1L, 7.0, 70.0)))
  }

  test("enrichStatic joins each micro-batch to the dim; no state required") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("userId", "tier")
    val q = EventStreams.enrichStatic(src.toDF(), dim, "userId")
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(Event(1, ts(1), "click", 1.0), Event(3, ts(2), "click", 3.0))
      q.processAllAvailable()
      val got = spark.table("enrich").select("userId", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(got == Set((1L, Some("gold")), (3L, None))) // left join keeps 3
    } finally q.stop()
  }

  test("multi-stateful pipeline: windowed agg downstream of the stream join") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = EventStreams.intervalJoin(clicks.toDF(), buys.toDF(),
      maxLag = "5 minutes", watermark = "1 minute")
    val q = joined
      .groupBy(window(col("l_ts"), "10 minutes").as("win"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("joinagg")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(1, ts(1), "click", 1.0))
      buys.addData(Event(1, ts(3), "purchase", 10.0),
        Event(1, ts(4), "purchase", 11.0))
      q.processAllAvailable()
      // push both watermarks far ahead so the join emits AND the window closes
      clicks.addData(Event(9, ts(50), "click", 0.0))
      buys.addData(Event(9, ts(50), "purchase", 0.0))
      q.processAllAvailable()
      clicks.addData(Event(9, ts(59), "click", 0.0))
      buys.addData(Event(9, ts(59), "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("joinagg").select("n").collect().map(_.getLong(0))
      assert(got.contains(2L), got.mkString(",")) // u1's two attributed pairs
    } finally q.stop()
  }

  test("dedupKeepFirst is the batch twin: min (ts, tieBreak) row per key") {
    val events = Seq(
      (10L, 100L, "click", 1.0), (11L, 50L, "click", 1.0), // dup: 11 earlier
      (12L, 50L, "click", 9.9), (13L, 50L, "view", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = EventStreams.dedupKeepFirst(events,
        Seq("event_type", "value"), "ts", "event_id")
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Double]("value"), r.getAs[Long]("ts"),
        r.getAs[Long]("event_id"))).toSet
    assert(got == Set(("click", 1.0, 50L, 11L),
      ("click", 9.9, 50L, 12L), ("view", 1.0, 50L, 13L)))
  }
}
