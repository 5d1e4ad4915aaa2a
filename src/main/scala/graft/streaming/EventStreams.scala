package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the `events` table in stream form. */
final case class Event(userId: Long, ts: Timestamp, eventType: String, value: Double)

/** A closed (or batch-final) per-user session. */
final case class UserSession(userId: Long, start: Timestamp, end: Timestamp,
    nEvents: Long, totalValue: Double)

private final case class SessionState(startUs: Long, endUs: Long,
    nEvents: Long, totalValue: Double)

/** A left event enriched with the most recent at-or-before right event of
  * the same user ([[EventStreams.asOfEnrich]]). */
final case class EnrichedEvent(userId: Long, ts: Timestamp, eventType: String,
    value: Double, rTs: Option[Timestamp], rValue: Option[Double])

private final case class AsOfTagged(userId: Long, ts: Timestamp,
    isRight: Boolean, eventType: String, value: Double)

private final case class AsOfRef(tsUs: Long, value: Double)

/** Structured Streaming over the `events` schema (scale extension — the
  * reference is pure batch, SURVEY.md §2.S; this is the `readStream` →
  * watermark → windowed-agg / stateful-session path a 100 TB event feed
  * needs).
  *
  * Both entry points take a source DataFrame/Dataset, so the same code runs
  * on `spark.readStream` (incremental, stateful) and on the batch parquet
  * table (one-shot) — the test suite exercises both.
  */
object EventStreams extends Serializable {

  /** Generic epoch-nanos long → TimestampType (kept for nanos-typed
    * sources; the current events table is timestamp[us] — use
    * `Tables.eventTs`/`eventTsMicros` for it);
    * convert to an event-time timestamp column. Column `/` is DOUBLE
    * division and epoch nanos (~1.7e18) exceed double's 2^53 exact range —
    * the naive `(nanos / 1000).cast("long")` lands ±1 µs off. Decimal
    * division + floor is exact. */
  def nanosToTs(nanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(floor(nanos.cast("decimal(38,0)") / 1000).cast("long"))

  /** `Timestamp.getTime` is MILLIS — state and gap comparisons run in the
    * MICROSECOND domain Spark timestamps actually carry (the same
    * convention as the batch catalog and the DuckDB oracle). */
  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling-window per-type counts with a watermark: late rows beyond
    * `watermark` are dropped from the aggregation state (bounded state —
    * the property that keeps this runnable forever on a real stream). */
  def windowedTypeCounts(events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("eventType"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("eventType"), col("n"), col("total_value"))

  /** Hopping (sliding) window per-type counts: windows of `windowLen`
    * opening every `slide` — each event lands in len/slide overlapping
    * windows (Spark's `window(ts, len, slide)` expands rows by that
    * factor BEFORE the hash agg, so state stays one row per
    * (window, type), bounded by the watermark exactly like tumbling). */
  def hoppingTypeCounts(events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col("eventType"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("eventType"), col("n"), col("total_value"))

  /** Windowed frequent-items via the Misra–Gries `freq_sketch`
    * TypedImperativeAggregate — custom mergeable sketch STATE inside
    * Structured Streaming: partial sketches serialize into the streaming
    * state store and merge across micro-batches exactly as map-side
    * partials merge in batch, so per-window state is O(k) regardless of
    * event volume. With `k` ≥ the live alphabet the MG counts are exact
    * (no decrements ever fire), which is what the batch-parity oracle
    * states declaratively; undersized k degrades to the usual
    * (cnt, cnt + n/k) frequency bounds.
    * @return `(win_start, event_type, cnt, win_total)` */
  def windowedFrequentTypes(events: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes", windowLen: String = "1 hour",
      k: Int = 64): DataFrame = {
    graft.expressions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(call_function("freq_sketch", col("eventType"), lit(k)).as("sk"))
      .select(col("window.start").as("win_start"), explode(col("sk")).as("e"))
      .select(col("win_start"), col("e.item").as("event_type"),
        col("e.cnt").as("cnt"), col("e.n").as("win_total"))
  }

  /** Windowed DDSketch value histogram — the quantile member of the
    * streaming sketch family beside [[windowedFrequentTypes]]' Misra–
    * Gries counts: per event-time window, the log-bucket histogram of
    * `valueCol` ([[graft.operators.Sketches]]). The histogram IS the
    * sketch state, and it's a plain `groupBy(window, bucket).count` —
    * a single streaming-safe aggregation whose partials merge across
    * micro-batches by addition, O(buckets) state per window regardless
    * of event volume. Quantile EXTRACTION
    * ([[graft.operators.Sketches.ddQuantilesOfHistogram]]) is the
    * downstream serving step over the emitted frame: chaining it here
    * would need a second stateful agg, which append-mode streaming
    * rightly refuses.
    * @return `(win_start, bucket, c)` */
  def windowedValueSketch(events: DataFrame, tsCol: String = "ts",
      valueCol: String = "value", watermark: String = "10 minutes",
      windowLen: String = "1 hour", alpha: Double = 0.01): DataFrame =
    // same domain guard as the batch ddHistogram: positive AND finite
    // (NaN passes `> 0` in Spark's ordering; ±Inf has no log bucket)
    events.filter(col(valueCol) > 0 &&
        abs(col(valueCol)) <= lit(Double.MaxValue))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        graft.operators.Sketches.ddIndex(col(valueCol), alpha).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("win_start"), col("bucket"), col("c"))

  /** Per-user session assembly via flatMapGroupsWithState with event-time
    * timeout: a session closes after `gapSeconds` of silence (emitted on
    * watermark passage in streaming; batch mode emits every session, the
    * last one included, since batch has no "future"). */
  def sessionize(events: Dataset[Event], gapSeconds: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    val isStreaming = events.isStreaming

    def toSession(uid: Long, s: SessionState): UserSession =
      UserSession(uid, fromUs(s.startUs), fromUs(s.endUs),
        s.nEvents, s.totalValue)

    def handle(uid: Long, evs: Iterator[Event],
        state: GroupState[SessionState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession(uid, _)).iterator
        state.remove()
        out
      } else {
        // INTERVAL SWEEP over (carried open session ∪ batch events), sorted
        // by start time: adjacent items merge whenever the next start is
        // within `gap` of the running end — exactly the grouping a batch
        // replay of the same rows produces. This makes straggler handling
        // uniform: a gap-distant early event (unreachable at the default
        // watermark == gap, but reachable under a laxer watermark) opens
        // its own bygone session AND merges with adjacent stragglers,
        // where the r5 per-event branch emitted each as a singleton.
        // Merged sums (n, total, min/max bounds) are order-independent
        // within a group, so the sweep is deterministic.
        val items = (state.getOption.toSeq ++
            evs.map(e => SessionState(toUs(e.ts), toUs(e.ts), 1L, e.value)))
          .sortBy(s => (s.startUs, s.endUs, s.nEvents, s.totalValue))
        var cur: Option[SessionState] = None
        val closed = Seq.newBuilder[UserSession]
        items.foreach { it =>
          cur match {
            case Some(s) if it.startUs - s.endUs <= gapUs =>
              cur = Some(SessionState(math.min(s.startUs, it.startUs),
                math.max(s.endUs, it.endUs),
                s.nEvents + it.nEvents, s.totalValue + it.totalValue))
            case Some(s) =>
              closed += toSession(uid, s)
              cur = Some(it)
            case None =>
              cur = Some(it)
          }
        }
        cur.foreach { s =>
          if (isStreaming) {
            state.update(s)
            // timeout timestamps are millis; round UP so the timeout never
            // fires a microsecond-fraction early
            state.setTimeoutTimestamp(Math.floorDiv(s.endUs + gapUs + 999L, 1000L))
          } else {
            closed += toSession(uid, s) // batch: no future rows can extend it
          }
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        if (isStreaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(handle)
  }

  /** Streaming as-of enrichment — the incremental face of
    * [[graft.operators.AsOfJoin]]: every left event picks up the most
    * recent at-or-before right event of the same user (e.g. each click
    * joins its latest preceding purchase).
    *
    * State is ONE `(ts, value)` ref per user — bounded by key cardinality,
    * not by stream history, and never by time (a reference price/purchase
    * must stay enrichable indefinitely, so no watermark eviction; evict
    * idle keys upstream if the key space itself is unbounded).
    *
    * Ordering: within a micro-batch rows process in event-time order with
    * right-before-left at equal timestamps (inclusive `<=`, same as the
    * batch operator). Across micro-batches a right event only advances the
    * state monotonically (`ts` strictly greater wins), so a late right row
    * older than the current ref is ignored rather than regressing it; left
    * rows older than the ref (late arrivals) emit unenriched instead of
    * seeing the future. In batch mode one group pass sees everything and
    * the result equals AsOfJoin.asOf exactly.
    */
  def asOfEnrich(left: Dataset[Event], right: Dataset[Event]): Dataset[EnrichedEvent] = {
    import left.sparkSession.implicits._

    def handle(uid: Long, rows: Iterator[AsOfTagged],
        state: GroupState[AsOfRef]): Iterator[EnrichedEvent] = {
      val sorted = rows.toArray.sortBy(r =>
        (toUs(r.ts), if (r.isRight) 0 else 1, r.eventType, r.value))
      var cur = state.getOption
      val out = Seq.newBuilder[EnrichedEvent]
      sorted.foreach { r =>
        val t = toUs(r.ts)
        if (r.isRight) {
          if (cur.forall(_.tsUs < t)) cur = Some(AsOfRef(t, r.value))
        } else {
          val ref = cur.filter(_.tsUs <= t) // a late left row must not see the future
          out += EnrichedEvent(uid, r.ts, r.eventType, r.value,
            ref.map(s => fromUs(s.tsUs)), ref.map(_.value))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    left.map(e => AsOfTagged(e.userId, e.ts, isRight = false, e.eventType, e.value))
      .union(right.map(e => AsOfTagged(e.userId, e.ts, isRight = true, e.eventType, e.value)))
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(handle)
  }

  /** Exact streaming dedup on a content key — the at-least-once-delivery
    * dedup stage of a streaming ingest (the streaming face of
    * operators.Dedup.exact). Keeps the first arriving row per key; a
    * key's state is evicted once the watermark passes its event time +
    * `delay`, so state is bounded by delay × arrival rate, never by
    * stream history (a duplicate arriving after eviction is re-emitted —
    * the standard bounded-state trade-off). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Batch twin of [[dedupStream]]: keep the minimum `(tsCol, tieBreak)`
    * row per key — identical output when the stream arrives in event-time
    * order within the watermark. One partial+final hash agg (map-side
    * combine), no windows, no shuffle beyond the key grouping. */
  def dedupKeepFirst(events: DataFrame, keyCols: Seq[String],
      tsCol: String, tieBreak: String): DataFrame =
    events.groupBy(keyCols.map(col): _*)
      .agg(min(struct(col(tsCol), col(tieBreak))).as("__first"))
      .select(keyCols.map(col) ++ Seq(
        col(s"__first.$tsCol").as(tsCol),
        col(s"__first.$tieBreak").as(tieBreak)): _*)

  /** Stream-static broadcast enrichment — the stateless streaming join:
    * each micro-batch joins against the (small) static dimension with NO
    * state at all, so it composes freely before any stateful stage. The
    * dim is re-resolved per micro-batch (a dim UPDATE is picked up on the
    * next batch — the standard slowly-changing-dimension behavior). In
    * batch the same call is a plain broadcast hash join. */
  def enrichStatic(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Dictionary prefilter for a stream — the allowlist-firehose shape: keep
    * only events whose key is in a (large) static dictionary, without
    * shuffling the firehose. A Bloom sketch of the dictionary is built ONCE
    * at query construction and rides a broadcast handle
    * ([[graft.expressions.BloomMightContainBc]]) as a NARROW per-row probe,
    * so non-members drop inside the stream's scan stage; the exact
    * stream-static LEFT SEMI join (stateless — no watermark needed) then
    * sees only true members plus the fpp sliver and removes the false
    * positives. Semantics are exactly `stream SEMI JOIN dict` — the probe
    * only prunes, Bloom has no false negatives.
    *
    * At warehouse scale this is the difference between semi-joining every
    * micro-batch row against the dictionary (a per-batch shuffle or a
    * dictionary-sized broadcast hash relation) and probing a bitset that
    * ships once per executor. The same call runs in batch (the catalog's
    * `s10_stream_bloom_filter` replays it under a DuckDB oracle); the
    * probe keys are compared in the STRING domain on both build and probe
    * sides (`bloomOf` casts the build side; the probe casts here). */
  def bloomSemiStatic(stream: DataFrame, dict: DataFrame, key: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    // persisted: the sizing count, the sketch treeAggregate, and the
    // verify join's first resolution all read the distinct dictionary —
    // uncached it would recompute (scan + distinct shuffle) per consumer.
    // Release registered AFTER the construction jobs (the r10 rule: a
    // Dataset->RDD job fires the one-shot listener, see CachesSpec). A
    // long-running STREAM re-resolves the dictionary per micro-batch once
    // the release fires — deliberate, the same slowly-changing-dimension
    // re-resolution enrichStatic documents.
    val keys = dict.select(col(key)).distinct().persist()
    val sized =
      if (expectedItems > 0) expectedItems
      else math.max(keys.count(), 1L << 10)
    val bytes = graft.operators.Dedup.bloomOf(keys, key, sized, fpp)
    val bc = keys.sparkSession.sparkContext.broadcast(bytes)
    graft.Caches.releaseAfterAction(keys)
    stream
      .filter(graft.expressions.BloomMightContain.probe(
        bc, col(key).cast("string")))
      .join(keys, Seq(key), "leftsemi")
  }

  /** Stream-side duplicated-span COVERAGE against a static gram
    * dictionary — ng1's per-doc contamination-span measurement
    * (Lee et al. 2022 / ct1 dictionary semantics) re-planned so a
    * document stream can score ITSELF statelessly: the batch form needs
    * an explode → dictionary join → per-doc window re-aggregation, which
    * on a stream means stateful update-mode aggregation; here the whole
    * computation is per-ROW narrow expressions, so the SAME call runs as
    * an append-mode streaming projection or a batch query (the catalog's
    * `s11_stream_span_coverage` replays it in batch under a DuckDB
    * oracle; EventStreamsSpec pins micro-batch parity).
    *
    *  - dictionary: distinct train grams with the ct1 hot-gram cap
    *    (grams in more than `maxShingleTrainDocs` train docs are dropped
    *    + logged), built ONCE batch-side and broadcast as an EXACT set —
    *    the [[graft.expressions.SetContainsBc]] scope note applies: this
    *    is the dictionary-fits-memory regime (benchmark/eval suites);
    *    an unbounded dictionary takes the batch join path
    *    (`Dedup.contamination` / `duplicatedSpans`).
    *  - per doc: tokenize → n-gram array → per-ELEMENT exact membership
    *    probes (a join can test a row, not an array element — this is
    *    what the set expression exists for) → interval-merge fold over
    *    the (position-ordered) hits: covered-anew = span end minus
    *    max(previous ends)+1 clamped, the same gaps-and-islands formula
    *    as `Dedup.duplicatedSpans`, folded per row instead of windowed.
    *
    * @return one row per doc:
    *         `(doc_id, n_tok, n_grams, n_dup_grams, n_cov_tokens, dup_frac)` */
  def spanCoverageStatic(docs: DataFrame, trainDocs: DataFrame,
      idCol: String, textCol: String, n: Int,
      maxShingleTrainDocs: Int = 1000): DataFrame = {
    import graft.operators.{Dedup, TextFunctions}
    val spark = trainDocs.sparkSession
    // dictionary-sized collect (vocabulary-bounded, further capped): the
    // exact-set broadcast is the point — see the scope note above. The
    // cap filters SPARK-side so hot boilerplate grams never ship to the
    // driver; the gram frame is persisted so the drop audit and the kept
    // collect share one corpus scan (it is vocabulary-sized, not
    // corpus-sized).
    val dict = Dedup.shingleRows(trainDocs, idCol, textCol, n)
      .groupBy("sh").agg(count(lit(1)).as("nd"))
      .persist()
    val dropped = dict.filter(col("nd") > maxShingleTrainDocs).count()
    if (dropped > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"spanCoverageStatic: dropped $dropped hot gram(s) over the " +
          s"$maxShingleTrainDocs-train-doc cap")
    val kept = dict.filter(col("nd") <= maxShingleTrainDocs)
      .select("sh").collect()
    dict.unpersist()
    val bc = spark.sparkContext.broadcast(
      graft.expressions.SetContains.setOf(kept.iterator.map(_.getString(0))))
    def member(g: Column) = graft.expressions.SetContains.probe(bc, g)
    // batch replays get the standard explode-path widening; a streaming
    // source keeps its micro-batch partitioning (spread's plan-time stats
    // probe is a batch concept)
    val spreadDocs = if (docs.isStreaming) docs else Dedup.spread(docs)
    spreadDocs
      // NULL-id docs are dropped, mirroring Dedup.contamination's r10
      // contract (and the oracle's USING-join NULL semantics)
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
        TextFunctions.shingles(col("toks"), n).as("grams"))
      .withColumn("hits", filter(
        transform(col("grams"),
          (g, i) => struct(i.cast("long").as("i"), member(g).as("hit"))),
        s => s.getField("hit")))
      // interval merge as a left fold over position-ordered hits: state =
      // (max end seen, covered tokens); transform/filter preserve order
      .withColumn("st", aggregate(col("hits"),
        struct(lit(-1L).as("prev_end"), lit(0L).as("cov")),
        (st, x) => {
          val e = least(x.getField("i") + (n - 1), col("n_tok") - 1)
          struct(
            greatest(st.getField("prev_end"), e).as("prev_end"),
            (st.getField("cov") + greatest(lit(0L),
              e - greatest(x.getField("i"), st.getField("prev_end") + 1) + 1))
              .as("cov"))
        }))
      .select(col("doc_id"), col("n_tok"),
        size(col("grams")).cast("long").as("n_grams"),
        size(col("hits")).cast("long").as("n_dup_grams"),
        col("st").getField("cov").as("n_cov_tokens"),
        round(col("st").getField("cov") / col("n_tok"), 6).as("dup_frac"))
  }

  /** Streaming incremental MinHash near-dup — [[graft.operators.Dedup
    * .minhashCandidatesAgainst]]'s semantics as a STATELESS append-mode
    * stage: each arriving document's K-component minhash signature is
    * computed as a PER-ROW projection (the per-doc `groupBy(min)` of the
    * batch path becomes `array_min` over the shingle array — min over a
    * multiset equals min over its set, so the two are value-identical),
    * its band keys exploded, and the bands equi-joined against the
    * STATIC reference corpus's banded signatures (stream-static inner
    * join — per-batch, no state, no watermark). Output is one row per
    * (doc, matched ref doc, band) — unique by construction (one stream
    * row per band, one ref row per (ref, band)) so no streaming
    * dedup/aggregation state is needed; the daily-increment consumer
    * aggregates downstream in batch (count DISTINCT ref per doc = dd7).
    *
    * Scale stance: the reference side is banded ONCE per batch with the
    * standard hot-bucket cap + drop audit (a hot reference bucket is
    * what blows up the join); cost per micro-batch is |batch bands| ×
    * ref-bucket occupancy, never |corpus|². Docs with NULL ids or fewer
    * than `n` tokens (no shingles → no signature, exactly the batch
    * path's absence) are dropped. Same call runs in batch — the
    * catalog's `s12_stream_minhash` replays it under the dd7-family
    * DuckDB oracle; EventStreamsSpec pins micro-batch parity across ≥2
    * files. */
  def minhashHitsStatic(docs: DataFrame, refDocs: DataFrame,
      idCol: String, textCol: String, n: Int, k: Int, bandsOf: Int,
      maxBucket: Int = 1000): DataFrame = {
    import graft.operators.{Dedup, TextFunctions}
    require(k % bandsOf == 0, "k must divide into bands")
    // NULL-id refs must not band: they'd count toward the bucket cap (and
    // emit NULL ref_id hits) that dd7's inner source-flag join and the
    // oracle's USING join both exclude — the same drop the stream side gets
    val refSigs = Dedup.minhashSignaturesOf(
      refDocs.filter(col(idCol).isNotNull), idCol, textCol, n, k)
    val refBands0 = Dedup.capBuckets(Dedup.bandRows(refSigs, k, bandsOf),
        Seq(col("band"), col("bkey")), maxBucket, "minhashHitsStatic")
      .select(col("doc_id").as("ref_id"), col("band"), col("bkey"))
    // a stream-static join re-executes the static subtree EVERY micro-batch
    // unless it is cached — persist the banded reference for the lifetime
    // of the streaming query (the index artifact, built once; a real
    // deployment would materialize it to storage and re-attach), released
    // when the session's streaming queries terminate so repeated builder
    // calls don't accumulate session-lifetime caches. Batch replays
    // consume it once, where a persist is pure write cost — skip.
    val refBands = if (docs.isStreaming) {
      val cached = refBands0.persist()
      graft.Caches.releaseAfterStreams(cached)
      cached
    } else refBands0
    // batch replays get the standard explode-path widening; a streaming
    // source keeps its micro-batch partitioning
    val src = if (docs.isStreaming) docs else Dedup.spread(docs)
    val p = Dedup.MinhashP
    val sigCols = Dedup.minhashCoeffs(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hs"), h => (h * a + b) % p)).as(s"h$i")
    }
    val bandStructs = (0 until k / bandsOf).map { bnd =>
      struct(lit(bnd).as("band"),
        md5(concat_ws("_",
          (0 until bandsOf).map(j => col(s"h${bnd * bandsOf + j}")): _*))
          .as("bkey"))
    }
    src
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        TextFunctions.shingles(col("toks"), n).as("grams"))
      .filter(size(col("grams")) >= 1)
      // one md5 per shingle (the minhashSignatures convention); the K
      // families are affine over the base hash
      .withColumn("hs", transform(col("grams"), g => Dedup.hash60(g) % p))
      .select(col("doc_id") +: sigCols: _*)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .join(refBands, Seq("band", "bkey"))
      .select(col("doc_id"), col("ref_id"), col("band"))
  }

  /** Watermarked stream-stream interval join — the attribution shape
    * (click → purchases of the same user within `maxLag` AFTER the
    * click). Both sides carry a watermark and the join predicate bounds
    * `right.ts` to `[left.ts, left.ts + maxLag]`, which is exactly what
    * lets Spark's symmetric hash join EVICT state: a buffered left row
    * can never match once the right watermark passes `l_ts + maxLag`, a
    * buffered right row once the left watermark passes `r_ts`. State is
    * bounded by (watermark delay + maxLag) × arrival rate, never stream
    * history. Both inputs must be schema'd `(userId, ts, value)` (use
    * `select` to adapt); the same call runs in batch, where it is a plain
    * range-predicate inner join (watermarks are no-ops) — the catalog's
    * `s6_stream_join` replays it that way under a DuckDB oracle. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      maxLag: String = "1 hour", watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("userId").as("l_user"), col("ts").as("l_ts"),
        col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("userId").as("r_user"), col("ts").as("r_ts"),
        col("value").as("r_value"))
    l.join(r, col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxLag"))
      .select(col("l_user").as("userId"), col("l_ts"), col("l_value"),
        col("r_ts"), col("r_value"))
  }
}
