package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.CsvIO
import graft.streaming.EventStreams

/** Catalog entries for §S (streaming operators, batch-replayed so the
  * DuckDB gate can check them) and A5 (delimited param-list scan). */
object StreamParityQueries {

  /** S1 — the watermarked tumbling-window aggregation of
    * EventStreams.windowedTypeCounts, run in batch mode over the `events`
    * table (same code path the stream uses; on a bounded input the
    * watermark is a no-op and the result is the complete window set).
    * Window starts exported as epoch seconds: engine-portable, no
    * timestamp-precision hashing hazards. */
  private val s1 = Q(
    "s1_stream_window",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
      EventStreams.windowedTypeCounts(ev, windowLen = "1 hour")
        .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
          col("eventType").as("event_type"), col("n"),
          round(col("total_value"), 6).as("total_value"))
    },
    Some("""SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
                     AS win_start_epoch,
                   event_type, count(*) AS n,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY 1, 2"""))

  /** S5 — hopping-window counts (EventStreams.hoppingTypeCounts), batch-
    * replayed: 1-hour windows sliding every 30 minutes, so every event
    * lands in exactly two windows. The oracle derives both window starts
    * per event arithmetically in the µs domain (the 30-min bucket and
    * the one before it) and aggregates — the same expansion Spark's
    * `window(ts, len, slide)` performs before its hash agg. */
  private val s5 = Q(
    "s5_stream_hopping",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
      EventStreams.hoppingTypeCounts(ev, windowLen = "1 hour", slide = "30 minutes")
        .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
          col("eventType").as("event_type"), col("n"),
          round(col("total_value"), 6).as("total_value"))
    },
    Some("""WITH e AS (SELECT epoch_us(ts) AS tsu, event_type, value FROM events),
            x AS (SELECT unnest([ (tsu // 1800000000) * 1800,
                                  (tsu // 1800000000) * 1800 - 1800 ])
                    AS win_start_epoch,
                  event_type, value
                  FROM e)
            SELECT win_start_epoch, event_type, CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS total_value
            FROM x GROUP BY 1, 2"""))

  /** S2 — streaming exact dedup, batch-replayed: dedupKeepFirst is the
    * batch twin of EventStreams.dedupStream (dropDuplicatesWithinWatermark)
    * — keep the earliest (ts, event_id) row per content key. Ordering and
    * output use the MICROSECOND epoch domain on both sides
    * (`Tables.eventTsMicros` ≡ `epoch_us(ts)`). */
  private val s2 = Q(
    "s2_stream_dedup",
    (s, d) =>
      EventStreams.dedupKeepFirst(
          Tables.events(s, d).withColumn("ts_us", Tables.eventTsMicros),
          Seq("user_id", "event_type", "value"), "ts_us", "event_id")
        .select(col("user_id"), col("event_type"),
          round(col("value"), 6).as("value"),
          col("ts_us").as("first_ts_us"), col("event_id")),
    Some("""WITH r AS (SELECT user_id, event_type, value,
                         epoch_us(ts) AS tsu, event_id,
                         row_number() OVER (PARTITION BY user_id, event_type, value
                           ORDER BY epoch_us(ts), event_id) AS rn
                       FROM events)
            SELECT user_id, event_type, round(value, 6) AS value,
                   tsu AS first_ts_us, event_id
            FROM r WHERE rn = 1"""))

  /** S3 — the stateful streaming as-of enrichment (flatMapGroupsWithState,
    * EventStreams.asOfEnrich), batch-replayed: every click picks up the
    * most recent at-or-before purchase of its user. Batch mode runs the
    * same handler over each user's full history in one pass, so the
    * DuckDB oracle states plain as-of semantics (ties among same-instant
    * purchases: minimum value — the handler's sort order). Timestamps
    * compare in the µs domain (s2's convention); `unix_micros` of a NULL
    * ref stays NULL for never-enriched clicks. */
  private val s3 = Q(
    "s3_stream_asof",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(
          col("user_id").as("userId"),
          Tables.eventTs.as("ts"),
          col("event_type").as("eventType"), col("value"))
        .as[graft.streaming.Event]
      EventStreams.asOfEnrich(
          ev.filter(col("eventType") === "click"),
          ev.filter(col("eventType") === "purchase"))
        .select(col("userId").as("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          round(col("value"), 6).as("value"),
          unix_micros(col("rTs")).as("r_ts_us"),
          round(col("rValue"), 6).as("r_value"))
    },
    Some("""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS tsu, value
                       FROM events WHERE event_type = 'click'),
            r0 AS (SELECT user_id, epoch_us(ts) AS tsu, value,
                     row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                       ORDER BY value) AS rn
                   FROM events WHERE event_type = 'purchase'),
            r AS (SELECT user_id, tsu, value FROM r0 WHERE rn = 1),
            -- partition by the UNIQUE click id: identical (user, ts,
            -- value) duplicate clicks must each keep their own row, as
            -- the handler emits one enrichment per event
            j AS (SELECT l.event_id, l.user_id, l.tsu, l.value,
                    r.tsu AS r_tsu, r.value AS r_value,
                    row_number() OVER (PARTITION BY l.event_id
                      ORDER BY r.tsu DESC) AS rn
                  FROM l LEFT JOIN r
                    ON l.user_id = r.user_id AND r.tsu <= l.tsu)
            SELECT user_id, tsu AS ts_us, round(value, 6) AS value,
                   r_tsu AS r_ts_us, round(r_value, 6) AS r_value
            FROM j WHERE rn = 1"""))

  /** S4 — the stateful streaming sessionizer (flatMapGroupsWithState with
    * event-time timeout, EventStreams.sessionize), batch-replayed: per
    * user, a session closes after 30 min of silence. Batch mode runs the
    * same handler over each user's full history (no watermark future), so
    * the oracle states plain gap-session semantics — the same SQL family
    * as the batch se1 twin, aggregated to (user, session) rows. µs domain
    * throughout (s2's convention); the handler accumulates value in
    * sorted order, round-6 absorbs the association difference. */
  private val s4 = Q(
    "s4_stream_sessions",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(
          col("user_id").as("userId"),
          Tables.eventTs.as("ts"),
          col("event_type").as("eventType"), col("value"))
        .as[graft.streaming.Event]
      EventStreams.sessionize(ev, gapSeconds = 1800)
        .select(col("userId").as("user_id"),
          unix_micros(col("start")).as("t_start_us"),
          unix_micros(col("end")).as("t_end_us"),
          col("nEvents").as("n_events"),
          round(col("totalValue"), 6).as("total_value"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
            l AS (SELECT *, lag(tsu) OVER (PARTITION BY user_id
                    ORDER BY tsu, value) AS prev FROM e),
            b AS (SELECT *, CASE WHEN prev IS NULL OR tsu - prev > 1800000000
                    THEN 1 ELSE 0 END AS brk FROM l),
            x AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                    ORDER BY tsu, value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                  FROM b)
            SELECT user_id, min(tsu) AS t_start_us, max(tsu) AS t_end_us,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 6) AS total_value
            FROM x GROUP BY user_id, sid"""))

  /** S6 — watermarked stream-stream interval join (attribution:
    * purchases within 1 hour AFTER a click of the same user), batch-
    * replayed through the identical EventStreams.intervalJoin call —
    * in batch the watermarks are no-ops and the plan is a plain
    * range-predicate inner join, so the DuckDB oracle states it
    * directly. µs domain on both engines (s2's convention); the µs lag
    * bound is arithmetically identical to Spark's `+ INTERVAL 1 hour`
    * on µs-precision timestamps. */
  private val s6 = Q(
    "s6_stream_join",
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id").as("userId"),
        Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
      EventStreams.intervalJoin(
          ev.filter(col("eventType") === "click"),
          ev.filter(col("eventType") === "purchase"),
          maxLag = "1 hour")
        .select(col("userId").as("user_id"),
          unix_micros(col("l_ts")).as("click_ts_us"),
          round(col("l_value"), 6).as("click_value"),
          unix_micros(col("r_ts")).as("purchase_ts_us"),
          round(col("r_value"), 6).as("purchase_value"))
    },
    Some("""WITH l AS (SELECT user_id, epoch_us(ts) AS tsu, value
                       FROM events WHERE event_type = 'click'),
            r AS (SELECT user_id, epoch_us(ts) AS tsu, value
                  FROM events WHERE event_type = 'purchase')
            SELECT l.user_id,
                   l.tsu AS click_ts_us, round(l.value, 6) AS click_value,
                   r.tsu AS purchase_ts_us, round(r.value, 6) AS purchase_value
            FROM l JOIN r ON l.user_id = r.user_id
              AND r.tsu >= l.tsu AND r.tsu <= l.tsu + 3600000000"""))

  /** S7 — stream-static broadcast enrichment (EventStreams.enrichStatic):
    * events pick up the customer's market segment (dimension keyed by
    * user id), then aggregate per (type, segment). Stateless — the only
    * streaming join that needs NO watermark — and in batch exactly a
    * broadcast left join under the aggregation. Unmatched users keep
    * NULL segment (left-join semantics on both engines). */
  private val s7 = Q(
    "s7_stream_enrich",
    (s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      EventStreams.enrichStatic(
          Tables.events(s, d).select("user_id", "event_type"), dim, "user_id")
        .groupBy("event_type", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT event_type, c_mktsegment, CAST(count(*) AS BIGINT) AS n
            FROM events LEFT JOIN customer ON user_id = c_custkey
            GROUP BY 1, 2"""))

  /** S8 — windowed frequent-items through the custom `freq_sketch`
    * TypedImperativeAggregate (EventStreams.windowedFrequentTypes),
    * batch-replayed: a Misra–Gries sketch of the event-type stream per
    * 1-hour window. Sketch capacity (64) far exceeds the 5-type
    * alphabet, so the MG counts are EXACT and the oracle states plain
    * per-(window, type) counts plus the window total. The streaming-mode
    * twin (sketch state merging across micro-batches in the state
    * store) is spec-tested in EventStreamsSpec. */
  private val s8 = Q(
    "s8_stream_freq_sketch",
    (s, d) => {
      val ev = Tables.events(s, d).select(Tables.eventTs.as("ts"),
        col("event_type").as("eventType"), col("value"))
      EventStreams.windowedFrequentTypes(ev, windowLen = "1 hour")
        .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
          col("event_type"), col("cnt"), col("win_total"))
    },
    Some("""WITH e AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
                         event_type
                       FROM events)
            SELECT CAST(epoch(w) AS BIGINT) AS win_start_epoch, event_type,
                   CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(count(*)) OVER (PARTITION BY w) AS BIGINT)
                     AS win_total
            FROM e GROUP BY w, event_type"""))

  private val s9Alpha = 0.01
  private val s9Qs = Seq(("p50", 0.5), ("p95", 0.95))

  /** S9 — windowed DDSketch value quantiles
    * (EventStreams.windowedValueSketch +
    * Sketches.ddQuantilesOfHistogram), batch-replayed: the stream's
    * per-window log-bucket histogram is the ONLY stateful aggregation
    * (partials merge by addition across micro-batches, O(buckets) state
    * per window); quantile extraction runs downstream over the emitted
    * frame — the sketch-then-serve split a 100 TB metrics feed uses.
    * Same cross-engine float-parity scheme as `qd1`: ln(γ), γ and
    * 2/(γ+1) are interpolated into the SQL from the Scala doubles the
    * plan uses. */
  private val s9 = Q(
    "s9_stream_value_sketch",
    (s, d) => {
      val ev = Tables.events(s, d).select(Tables.eventTs.as("ts"), col("value"))
      val hist = EventStreams
        .windowedValueSketch(ev, windowLen = "1 hour", alpha = s9Alpha)
        .select(unix_timestamp(col("win_start")).as("win_start_epoch"),
          col("bucket"), col("c"))
      graft.operators.Sketches
        .ddQuantilesOfHistogram(hist, Seq("win_start_epoch"), s9Alpha, s9Qs)
        .select(col("win_start_epoch") +: col("n") +:
          s9Qs.map { case (nm, _) => round(col(nm), 6).as(nm) }: _*)
    },
    Some {
      val g = graft.operators.Sketches.gamma(s9Alpha)
      val lg = graft.operators.Sketches.lnGamma(s9Alpha)
      val coef = 2.0 / (g + 1.0)
      val picks = s9Qs.map { case (nm, q) =>
        s"""round(max(CASE WHEN cum - c < ceil(n * $q) AND ceil(n * $q) <= cum
              THEN $coef * pow($g, b) END), 6) AS $nm"""
      }.mkString(",\n              ")
      s"""WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
                 CAST(ceil(ln(value) / $lg) AS BIGINT) AS b,
                 CAST(count(*) AS BIGINT) AS c
               FROM events WHERE value > 0 AND isfinite(value) GROUP BY 1, 2),
          cum AS (SELECT w, b, c,
                 CAST(sum(c) OVER (PARTITION BY w ORDER BY b) AS BIGINT) AS cum,
                 CAST(sum(c) OVER (PARTITION BY w) AS BIGINT) AS n FROM h)
          SELECT CAST(epoch(w) AS BIGINT) AS win_start_epoch, max(n) AS n,
              $picks
          FROM cum GROUP BY w"""
    })

  /** S10 — dictionary-prefiltered stream (EventStreams.bloomSemiStatic),
    * batch-replayed: keep only events of BUILDING-segment customers — the
    * allowlist-firehose shape. The dictionary's Bloom sketch rides a
    * broadcast handle as a narrow probe INSIDE the stream's scan stage
    * (non-members never reach a shuffle), and the exact stream-static
    * LEFT SEMI join removes the fpp sliver, so the output is exactly the
    * semi join the oracle states. Decimal-exact value sums: only 5
    * event-type groups over the whole table, so a double fold's
    * association order could flip the 6th decimal between engines
    * (fan1's rule). Streaming-mode parity (the probe + semi join over
    * micro-batches) is spec-tested in EventStreamsSpec. */
  private val s10 = Q(
    "s10_stream_bloom_filter",
    (s, d) => {
      val dict = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("user_id"))
      EventStreams.bloomSemiStatic(
          Tables.events(s, d).select("user_id", "event_type", "value"),
          dict, "user_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6)
            .as("total_value"))
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                AS total_value
            FROM events
            WHERE user_id IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
            GROUP BY 1"""))

  /** S11 — stream-side duplicated-span coverage against a static train
    * dictionary (`EventStreams.spanCoverageStatic`): ng1's per-doc
    * contamination-span measurement as a STATELESS per-row projection —
    * exact broadcast-set gram probes inside array lambdas + an
    * interval-merge fold — so the same call runs append-mode on a doc
    * stream (EventStreamsSpec pins micro-batch parity) and in batch
    * here, where the oracle replays it with the ct1 dictionary CTE and
    * ng1's window-based interval merge. The equality of the per-row fold
    * and the windowed gaps-and-islands is itself the interesting claim
    * this oracle pins. */
  private val s11 = Q(
    "s11_stream_span_coverage",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isTrain = substring(col("source"), 4, 10).cast("int") < 10
      graft.streaming.EventStreams.spanCoverageStatic(
        docs.filter(!isTrain), docs.filter(isTrain), "doc_id", "text", 3, 1000)
    },
    Some(s"""WITH bt AS (SELECT doc_id,
                      CAST(substring(source, 4) AS INT) < 10 AS is_train,
                      string_split_regex(trim(lower(text)), '\\s+') AS toks,
                      CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
                        AS BIGINT) AS n_tok
                    FROM documents),
             tr AS (SELECT sh FROM (
                      SELECT sh, count(DISTINCT doc_id) AS c FROM (
                        SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                        FROM bt WHERE is_train) GROUP BY sh)
                    WHERE c <= 1000),
             occ AS (SELECT doc_id, n_tok, toks, unnest(range(0, n_tok - 2)) AS pos
                     FROM bt WHERE NOT is_train AND n_tok >= 3),
             g AS (SELECT doc_id, n_tok, pos,
                     array_to_string(list_slice(toks,
                       CAST(pos + 1 AS INT), CAST(pos + 3 AS INT)), ' ') AS gram
                   FROM occ),
             dup AS (SELECT doc_id, n_tok, pos FROM g
                     WHERE gram IN (SELECT sh FROM tr)),
             sp AS (SELECT doc_id, pos, least(pos + 2, n_tok - 1) AS e,
                      max(least(pos + 2, n_tok - 1)) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS prev_end
                    FROM dup),
             cv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
                      CAST(sum(greatest(0, e - greatest(pos,
                        coalesce(prev_end + 1, pos)) + 1)) AS BIGINT)
                        AS n_cov_tokens
                    FROM sp GROUP BY doc_id)
             SELECT bt.doc_id, bt.n_tok,
               CAST(greatest(0, bt.n_tok - 2) AS BIGINT) AS n_grams,
               coalesce(cv.n_dup_grams, 0) AS n_dup_grams,
               coalesce(cv.n_cov_tokens, 0) AS n_cov_tokens,
               round(coalesce(cv.n_cov_tokens, 0) / bt.n_tok, 6) AS dup_frac
             FROM bt LEFT JOIN cv USING (doc_id)
             WHERE NOT bt.is_train AND bt.doc_id IS NOT NULL"""))

  /** S12 — streaming incremental MinHash near-dup against a static
    * reference corpus (`EventStreams.minhashHitsStatic`): dd7's
    * daily-increment semantics gone streaming — the per-doc signature is
    * a stateless per-row projection (`array_min` over the shingle array
    * replaces the batch `groupBy(min)`, value-identically), band keys
    * explode, and a stream-static inner join probes the banded reference.
    * Output is band-level hits (doc, ref, band) — unique by construction,
    * so append mode needs NO state; dd7's `n_ref_matches` is a distinct-
    * count over these rows downstream. Same k/bands/cap/split as dd7, so
    * the oracle is dd7's CTE chain stopped at the band join. */
  private val s12 = Q(
    "s12_stream_minhash",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val isRef = substring(col("source"), 4, 10).cast("int") < 15
      EventStreams.minhashHitsStatic(
        docs.filter(!isRef), docs.filter(isRef),
        "doc_id", "text", 3, 6, 2, 1000)
    },
    Some {
      val p = graft.operators.Dedup.MinhashP
      val mins = graft.operators.Dedup.minhashCoeffs(6).zipWithIndex
        .map { case ((a, b), k) => s"min((hs * $a + $b) % $p) AS h$k" }
        .mkString(",\n  ")
      val bandSelects = (0 until 3).map { b =>
        s"""SELECT doc_id, $b AS band,
              md5(CAST(h${2 * b} AS VARCHAR) || '_' || CAST(h${2 * b + 1} AS VARCHAR)) AS bkey
            FROM mh"""
      }.mkString("\nUNION ALL\n")
      s"""WITH t AS (SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS toks
             FROM documents),
          sh AS (SELECT DISTINCT doc_id, sh
                 FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
                       FROM t)),
          hs AS (SELECT doc_id, ${OracleSql.hash60("sh")} % $p AS hs FROM sh),
          mh AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
          fl AS (SELECT doc_id, CAST(substring(source, 4) AS INT) < 15 AS is_ref
                 FROM documents),
          bands AS ($bandSelects),
          nb AS (SELECT b.doc_id, band, bkey FROM bands b JOIN fl USING (doc_id)
                 WHERE NOT is_ref),
          rb0 AS (SELECT b.doc_id, band, bkey FROM bands b JOIN fl USING (doc_id)
                  WHERE is_ref),
          rb AS (SELECT doc_id, band, bkey
                 FROM (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz FROM rb0)
                 WHERE bsz <= 1000)
          SELECT n.doc_id, r.doc_id AS ref_id, CAST(n.band AS INT) AS band
          FROM nb n JOIN rb r ON n.band = r.band AND n.bkey = r.bkey"""
    })

  /** A5 — delimited parameter-list scan steering a plan
    * (read.delim("genes.txt")[,1] + toupper, BRCA_path_stage_DESeq.R:7-9):
    * the Spark side reads a real tab-delimited file through CsvIO; the
    * oracle states the equivalent literal predicate (the file content is
    * deterministic). */
  private val a5 = Q(
    "a5_param_scan",
    (s, d) => {
      val dir = Paths.get("/tmp/graft_params")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("types.txt"), "economy\nstandard\n")
      val types = CsvIO.readParamList(s, s"$dir/types.txt")
      Tables.part(s, d)
        .filter(col("p_type").isin(types.map(_.asInstanceOf[Any]): _*))
        .select(col("p_partkey"), col("p_type"))
    },
    Some("""SELECT p_partkey, p_type FROM part
            WHERE p_type IN ('ECONOMY','STANDARD')"""))

  def all: Seq[Q] = Seq(s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11, s12, a5)
}
