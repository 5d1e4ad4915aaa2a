package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2 groups H (union / pivot / melt / ragged export) and N
  * (nested-data) over the driver star schema. */
object ReshapeQueries {

  /** H1 — union-all of per-group frames (`do.call(rbind, mget(goi))`,
    * vital_status_DESeq.R:125-126). */
  private val h1 = Q(
    "h1_union_all",
    (s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), lit("closed").as("bucket"))
      val b = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("open").as("bucket"))
      a.unionByName(b)
    },
    Some("""SELECT o_orderkey, 'closed' AS bucket FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'"""))

  /** H3 — pivot replacing the reference's matrix transpose `t(gene_count)`
    * (vital_status_DESeq.R:106): long fact → samples×genes wide. Explicit
    * pivot values skip the extra distinct-scan job. */
  private val h3 = Q(
    "h3_pivot_wide",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .withColumnRenamed("A", "qty_a")
        .withColumnRenamed("N", "qty_n")
        .withColumnRenamed("R", "qty_r"),
    Some("""SELECT l_suppkey,
              sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
              sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n,
              sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r
            FROM lineitem GROUP BY l_suppkey"""))

  /** H4 — wide→long melt (the per-gene loop at vital_status_DESeq.R:118-126),
    * via Spark 3.4+ `unpivot` over the H3 wide frame. */
  private val h4 = Q(
    "h4_unpivot_melt",
    (s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
      wide.unpivot(Array(col("l_suppkey")),
        Array(col("A"), col("N"), col("R")), "flag", "qty")
        .filter(col("qty").isNotNull)
    },
    Some("""WITH wide AS (
              SELECT l_suppkey,
                sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qa,
                sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qn,
                sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qr
              FROM lineitem GROUP BY l_suppkey)
            SELECT l_suppkey, flag, qty FROM (
              SELECT l_suppkey, 'A' AS flag, qa AS qty FROM wide
              UNION ALL SELECT l_suppkey, 'N', qn FROM wide
              UNION ALL SELECT l_suppkey, 'R', qr FROM wide)
            WHERE qty IS NOT NULL"""))

  /** H5 — ragged `cbind.fill` export (vital_status_DESeq.R:147-168): one
    * column per (gene=brand, group=flag), rows keyed by a per-column
    * row_number, NULL-padded to the longest column, NA→'' at the edge (F10).
    * Values pass through BIGINT so the string form is engine-portable. */
  private val h5 = Q(
    "h5_ragged_export",
    (s, d) => {
      val t = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
          && col("l_returnflag").isin("A", "R"))
        .withColumn("colkey", concat_ws("_", col("p_brand"), col("l_returnflag")))
        .withColumn("v", col("l_quantity").cast("long").cast("string"))
      val keys = Seq("Brand#1_A", "Brand#1_R", "Brand#2_A", "Brand#2_R",
        "Brand#3_A", "Brand#3_R")
      // (l_orderkey, l_linenumber) is NOT unique in the driver data — `v`
      // completes the key so remaining ties carry identical values and the
      // rn assignment is order-independent.
      val w = Window.partitionBy(col("colkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("v"))
      t.withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("rn"))
        .pivot("colkey", keys)
        .agg(first(col("v")))
        .na.fill("", keys)
    },
    Some {
      val cols = Seq("Brand#1_A", "Brand#1_R", "Brand#2_A", "Brand#2_R",
        "Brand#3_A", "Brand#3_R")
      val caseCols = cols.map(k =>
        s"coalesce(max(CASE WHEN colkey = '$k' THEN v END), '') AS \"$k\"").mkString(",\n")
      s"""WITH t AS (
            SELECT p_brand || '_' || l_returnflag AS colkey,
                   CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS v,
                   row_number() OVER (PARTITION BY p_brand || '_' || l_returnflag
                     ORDER BY l_orderkey, l_linenumber,
                       CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)) AS rn
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
              AND l_returnflag IN ('A','R'))
          SELECT rn, $caseCols FROM t GROUP BY rn"""
    })

  /** N1 + D12 + F3 — nested ARRAY<STRUCT> explode, two-column membership
    * filter, patient-id harvest, distinct (drug_km_median_exp.R:36-53).
    * The nested column is manufactured with collect_list(struct(...)) to
    * exercise real ArrayType(StructType) plumbing, then exploded back. */
  private val n1 = Q(
    "n1_explode_nested",
    (s, d) => {
      val nested = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(collect_list(struct(
          col("o_orderpriority").as("treatment_type"),
          col("o_orderstatus").as("agent"))).as("treatments"))
      nested
        .select(col("o_custkey"), explode(col("treatments")).as("t"))
        .filter(col("t.treatment_type").isin("1-URGENT")
          || col("t.agent").isin("F"))
        .select(floor(col("o_custkey") / 10).cast("long").as("patient"))
        .distinct()
    },
    Some("""SELECT DISTINCT CAST(floor(o_custkey / 10) AS BIGINT) AS patient
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT') OR o_orderstatus IN ('F')"""))

  def all: Seq[Q] = Seq(h1, h3, h4, h5, n1)
}
