package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{CountCell, DiffExpression, Normalization, Stats, Survival}

/** The star-schema handles of SURVEY.md §1.4 — the rebuild's
  * `SummarizedExperiment`:
  * {{{
  * expression(gene_id, barcode, count)        // assay, long form
  * genes(gene_id, gene_name)                  // rowRanges
  * samples(barcode, submitter_id, vital_status, short_letter_code,
  *         ajcc_pathologic_stage, paper_brca_subtype_pam50,
  *         days_to_death, paper_days_to_last_followup,
  *         treatments ARRAY<STRUCT<submitter_id, treatment_type,
  *                                 therapeutic_agents>>)  // colData
  * }}}
  */
final case class TcgaTables(expression: DataFrame, genes: DataFrame, samples: DataFrame)

/** Public library surface replacing the six reference scripts (SURVEY.md
  * §3): each method is one reference pipeline as a single declarative
  * Spark plan over the long star schema — no transposes, no positional
  * renames, no per-gene driver loops.
  */
object Tcga {

  /** F6 — factor guard: values outside the ordered level list become NULL
    * (BRCA_path_stage_DESeq.R:60-62 semantics). */
  def factor(c: Column, levels: Seq[String]): Column =
    when(c.isin(levels.map(_.asInstanceOf[Any]): _*), c)

  /** F4 — AJCC substage collapse: "Stage IIA" → "Stage_II"
    * (BRCA_path_stage_DESeq.R:43-44). */
  def collapseStage(c: Column): Column =
    regexp_replace(regexp_replace(c, "A|B|C", ""), " ", "_")

  /** D1 — drop genes with total count < `minTotal`
    * (`rowSums(counts) >= 10`, vital_status_DESeq.R:47-48). */
  def prefilterGenes(expression: DataFrame, minTotal: Long = 10): DataFrame = {
    val keep = expression.groupBy("gene_id")
      .agg(sum(col("count")).as("tot")).filter(col("tot") >= minTotal)
      .select("gene_id")
    expression.join(keep, Seq("gene_id"), "left_semi")
  }

  /** D2+D6 — VST-normalized long counts `(gene_id, barcode, vst)`
    * (vst(), vital_status_DESeq.R:100-101): the parametric dispersion-
    * trend closed form (Normalization.vstTrend), DESeq2's own transform
    * shape. */
  def normalizedCounts(expression: DataFrame): DataFrame =
    Normalization.vstTrend(expression, "gene_id", "barcode", "count")
      .select(col("gene_id"), col("barcode"), col("vst"))

  /** §3.1/§3.2 — NB-GLM differential expression.
    *
    * @param conditionCol samples column holding the factor
    * @param levels       ordered levels; first = reference (fixes the
    *                     contrast direction, §1.1(d))
    * @param contrasts    extra pairwise contrasts (D4); empty → the default
    *                     last-vs-first `results()` contrast
    * @param goi          genes of interest by `gene_name` (B4); empty → all
    * @return long results `(gene_id, gene_name, contrast, base_mean,
    *         log2fc, lfc_se, stat, pvalue, padj, p_signif)`
    */
  def differentialExpression(t: TcgaTables, conditionCol: String,
      levels: Seq[String], contrasts: Seq[(String, String)] = Nil,
      goi: Seq[String] = Nil): DataFrame = {
    val spark = t.expression.sparkSession
    import spark.implicits._
    val cond = t.samples
      .withColumn("cond", factor(col(conditionCol), levels))
      .filter(col("cond").isNotNull)
      .select(col("barcode"), col("cond"))
    val expr0 = prefilterGenes(t.expression)
    val sf = Normalization.sizeFactors(expr0, "gene_id", "barcode", "count")
    // surrogate ids: the typed NB fit groups by a long key. A 60-bit
    // md5-prefix hash is deterministic and collision-free w.h.p. (~60k
    // genes vs 2^60) — unlike dense_rank over a no-partition Window it
    // never funnels the dim through one task.
    val geneIds = t.genes.select(col("gene_id"))
      .withColumn("gid", graft.operators.Dedup.hash60(col("gene_id")))
    val cells = expr0
      .join(broadcast(sf), "barcode")
      .join(cond, "barcode")
      .join(broadcast(geneIds), "gene_id")
      .withColumn("bid", abs(hash(col("barcode"))).cast("long"))
      .select(col("gid").as("gene"), col("bid").as("smp"),
        col("count").cast("double").as("cnt"), col("cond"),
        col("size_factor").as("sf")).as[CountCell]
      .persist() // feeds the dispersion-prior pass AND the per-gene fit
    val pairs = if (contrasts.nonEmpty) contrasts else Seq((levels.last, levels.head))
    val prior = DiffExpression.dispersionPrior(cells, levels.size)
    val de = DiffExpression.contrasts(cells, levels, pairs, Some(prior)).toDF()
    // registered AFTER the prior's collect — released on the caller's action
    graft.Caches.releaseAfterAction(cells.toDF())
    val named = de
      .join(broadcast(geneIds), de("gene") === geneIds("gid"))
      .join(broadcast(t.genes), "gene_id")
    // goi restriction BEFORE the BH adjustment: `results(data[keep,])`
    // (vital_status_DESeq.R:88-89) computes padj over the subset only
    val selected =
      if (goi.isEmpty) named
      else named.filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
    Stats.bhAdjust(selected, "pvalue", "gene_id", partitionCols = Seq("contrast"))
      .withColumn("p_signif", Stats.signifBand(col("padj")))
      .select(col("gene_id"), col("gene_name"), col("contrast"),
        col("log2fc"), col("lfc_se"), col("stat"), col("pvalue"),
        col("padj"), col("p_signif"))
  }

  /** D7 — per-gene two-group Wilcoxon on VST counts
    * (`compare_means(counts ~ cond, group.by = gene)`,
    * vital_status_DESeq.R:130), plus F5 banding on BH-adjusted p. */
  def wilcoxonByGene(t: TcgaTables, conditionCol: String,
      levels: (String, String), goi: Seq[String] = Nil): DataFrame = {
    val vst = normalizedCounts(prefilterGenes(t.expression))
    val vstNamed = vst.join(broadcast(t.genes), "gene_id")
    val selected =
      if (goi.isEmpty) vstNamed
      else vstNamed.filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
    val cond = t.samples
      .withColumn("cond", factor(col(conditionCol), Seq(levels._1, levels._2)))
      .filter(col("cond").isNotNull)
      .select(col("barcode"), col("cond"))
    val long = selected.join(cond, "barcode")
      .select(col("gene_name"), col("cond"), col("vst"))
    val wil = Stats.wilcoxon(long, "gene_name", "cond", "vst", levels._1, levels._2)
    Stats.bhAdjust(wil, "pvalue", "gene_name")
      .withColumn("p_signif", Stats.signifBand(col("padj")))
  }

  /** §3.1's stat-table assembly: Wilcoxon per gene annotated with the
    * NB-GLM significance band — the reference copies `res$p.signif` onto
    * the Wilcoxon rows POSITIONALLY after parallel sorts
    * (vital_status_DESeq.R:132-133); here it is an explicit join on
    * gene_name (SURVEY.md G1 note). */
  def wilcoxonWithDeBanding(t: TcgaTables, conditionCol: String,
      levels: (String, String), goi: Seq[String] = Nil): DataFrame = {
    val wil = wilcoxonByGene(t, conditionCol, levels, goi)
      .withColumnRenamed("padj", "wilcoxon_padj")
      .withColumnRenamed("p_signif", "wilcoxon_p_signif")
    val de = differentialExpression(t, conditionCol, Seq(levels._1, levels._2),
        goi = goi)
      .select(col("gene_name"), col("log2fc"), col("padj").as("de_padj"),
        col("p_signif").as("de_p_signif"))
    wil.join(de, Seq("gene_name"), "left")
  }

  /** H3 — presentation-edge wide counts (samples × genes), the only place
    * the reference's transpose survives (`t(gene_count)`,
    * vital_status_DESeq.R:106). Explicit pivot values: no distinct-scan job. */
  def wideCounts(t: TcgaTables, goi: Seq[String]): DataFrame = {
    val vst = normalizedCounts(t.expression)
      .join(broadcast(t.genes), "gene_id")
      .filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
    vst.groupBy("barcode").pivot("gene_name", goi).agg(first(col("vst")))
  }

  /** H5 — ragged `cbind.fill` export: one column per (gene, group), rows
    * row_number-keyed, NULL-padded (vital_status_DESeq.R:147-168). */
  def raggedExport(t: TcgaTables, conditionCol: String, goi: Seq[String],
      groups: Seq[String]): DataFrame = {
    val vst = normalizedCounts(t.expression)
      .join(broadcast(t.genes), "gene_id")
      .filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
      .join(t.samples.select(col("barcode"),
        factor(col(conditionCol), groups).as("grp")), "barcode")
      .filter(col("grp").isNotNull)
      .withColumn("colkey", concat_ws("_", col("gene_name"), col("grp")))
    val keys = for { g <- goi; c <- groups } yield s"${g}_$c"
    val w = Window.partitionBy(col("colkey"))
      .orderBy(col("vst"), col("barcode"))
    vst.withColumn("rn", row_number().over(w).cast("long"))
      .groupBy("rn").pivot("colkey", keys).agg(first(col("vst")))
  }

  /** §3.3 — KM survival stratified by median expression: per gene of
    * interest, samples split LOW/HIGH at the median VST (E1 ntile), curves
    * via D10, log-rank via D11 — all genes in one plan.
    *
    * @return (curves, tests): curves keyed by (gene_name, strat); tests one
    *         row per gene_name with chi2/pvalue
    */
  def kmByMedianExpression(t: TcgaTables, goi: Seq[String],
      tiles: Int = 2): (DataFrame, DataFrame) = {
    val subjects = t.samples
      .withColumn("status",
        when(col("vital_status") === "Alive", 1).otherwise(2)) // F7
      .withColumn("time",
        when(col("vital_status") === "Alive",
          col("paper_days_to_last_followup").cast("double"))
          .otherwise(col("days_to_death").cast("double"))) // F8+F9
      .filter(col("time").isNotNull && col("vital_status").isNotNull) // B7
      .select(col("barcode"), col("time"), (col("status") - 1).cast("long").as("event"))
    val vst = normalizedCounts(prefilterGenes(t.expression))
      .join(broadcast(t.genes), "gene_id")
      .filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
    val w = Window.partitionBy(col("gene_name")).orderBy(col("vst"), col("barcode"))
    val strat = vst
      .withColumn("tile", ntile(tiles).over(w))
      .filter(col("tile") === 1 || col("tile") === tiles) // keep extremes (E1)
      .withColumn("strat", when(col("tile") === 1, "LOW").otherwise("HIGH")) // F11
      .join(subjects, "barcode")
    val curves = Survival.kmCurve(
      strat.withColumn("gs", concat_ws("|", col("gene_name"), col("strat"))),
      "gs", "time", "event")
      .withColumn("gene_name", split(col("gs"), "\\|").getItem(0))
      .withColumn("strat", split(col("gs"), "\\|").getItem(1))
      .drop("gs")
    val tests = Survival.logRankBy(strat, "gene_name", "strat", "time", "event")
    (curves, tests)
  }

  /** H4 — boxplot-ready long frame `(gene, cond, counts)` (the melt at
    * vital_status_DESeq.R:118-126 feeding ggplot, A7): the engine's
    * deliverable for the plot sink. */
  def boxplotFrame(t: TcgaTables, conditionCol: String, levels: Seq[String],
      goi: Seq[String]): DataFrame = {
    val cond = t.samples
      .withColumn("cond", factor(col(conditionCol), levels))
      .filter(col("cond").isNotNull)
      .select(col("barcode"), col("cond"))
    normalizedCounts(prefilterGenes(t.expression))
      .join(broadcast(t.genes), "gene_id")
      .filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
      .join(cond, "barcode")
      .select(col("gene_name").as("gene"), col("cond"), col("vst").as("counts"))
  }

  /** F12 — the all-ns plot-fallback branch (BRCA_path_stage_DESeq.R:182-201):
    * driver-side control flow on one collected scalar, never a fact-path
    * collect. */
  def allNonSignificant(deResults: DataFrame): Boolean =
    deResults.filter(col("p_signif").isNotNull && col("p_signif") =!= "ns")
      .limit(1).count() == 0L

  /** N2 — the per-drug-class KM fan-out (drug_km_median_exp.R:38-130's
    * outer loop) as ONE plan: samples are tagged with every drug class
    * they match (a class-table join over the exploded treatments, so a
    * patient on two classes contributes to both cohorts), then the KM
    * median-split pipeline runs once partitioned by (drug_class, gene).
    *
    * @return (curves, tests) with a leading `drug_class` column
    */
  def drugKmFanOut(t: TcgaTables, drugClasses: Seq[String],
      goi: Seq[String]): (DataFrame, DataFrame) = {
    val spark = t.samples.sparkSession
    import spark.implicits._
    val classes = drugClasses.toDF("drug_class")
    val matches = t.samples
      .select(col("barcode"), col("submitter_id"), explode(col("treatments")).as("tr"))
      .join(broadcast(classes),
        col("tr.treatment_type") === col("drug_class") ||
          col("tr.therapeutic_agents") === col("drug_class")) // B5
      .select(col("drug_class"), substring(col("submitter_id"), 1, 12).as("patient"))
      .distinct() // D12
    val cohortSamples = t.samples
      .join(matches, substring(col("submitter_id"), 1, 12) === col("patient")) // C4
      .select(col("drug_class"), t.samples("barcode").as("barcode"),
        col("vital_status"), col("days_to_death"), col("paper_days_to_last_followup"))
    val subjects = cohortSamples
      .withColumn("time",
        when(col("vital_status") === "Alive",
          col("paper_days_to_last_followup").cast("double"))
          .otherwise(col("days_to_death").cast("double")))
      .filter(col("time").isNotNull && col("vital_status").isNotNull)
      .withColumn("event",
        when(col("vital_status") === "Alive", 0L).otherwise(1L))
      .select(col("drug_class"), col("barcode"), col("time"), col("event"))
    // per-cohort normalization, as the reference does (vst on the SUBSET,
    // drug_km_median_exp.R:61-67): expression replicated per matching
    // class, then prefilter + geomeans + size factors keyed by
    // (class, gene) / (class, sample) via composite keys. The dispersion
    // trend pools across cohorts (documented deviation: more stable for
    // small cohorts; per-cohort sf is the load-bearing normalization).
    val cohortCells = t.expression
      .join(subjects.select(col("drug_class"), col("barcode")), "barcode")
      .withColumn("cg", concat_ws("|", col("drug_class"), col("gene_id")))
      .withColumn("cb", concat_ws("|", col("drug_class"), col("barcode")))
      .withColumn("tot", sum(col("count")).over(Window.partitionBy(col("cg"))))
      .filter(col("tot") >= 10) // D1 within the cohort
      .drop("tot")
    val vst = Normalization.vstTrend(cohortCells, "cg", "cb", "count")
      .join(broadcast(t.genes), "gene_id")
      .filter(col("gene_name").isin(goi.map(_.asInstanceOf[Any]): _*))
    // median split INSIDE each (class, gene) cohort, as the reference does
    val strat = vst.join(subjects, Seq("drug_class", "barcode"))
      .withColumn("tile", ntile(2).over(Window
        .partitionBy(col("drug_class"), col("gene_name"))
        .orderBy(col("vst"), col("barcode"))))
      .withColumn("strat", when(col("tile") === 1, "LOW").otherwise("HIGH"))
      .withColumn("cgs",
        concat_ws("|", col("drug_class"), col("gene_name"), col("strat")))
    val curves = Survival.kmCurve(strat, "cgs", "time", "event")
      .withColumn("drug_class", split(col("cgs"), "\\|").getItem(0))
      .withColumn("gene_name", split(col("cgs"), "\\|").getItem(1))
      .withColumn("strat", split(col("cgs"), "\\|").getItem(2))
      .drop("cgs")
    val tests = Survival.logRankBy(
      strat.withColumn("cg", concat_ws("|", col("drug_class"), col("gene_name"))),
      "cg", "strat", "time", "event")
      .withColumn("drug_class", split(col("cg"), "\\|").getItem(0))
      .withColumn("gene_name", split(col("cg"), "\\|").getItem(1))
      .drop("cg")
    (curves, tests)
  }

  /** N1+B5+D12+F3+C4 — drug-cohort restriction (drug_km_median_exp.R:36-56):
    * explode the nested treatments table, match the drug class on either
    * column, harvest distinct patient prefixes, semi-join the samples. */
  def drugCohort(samples: DataFrame, drugClasses: Seq[String]): DataFrame = {
    val cls = drugClasses.map(_.asInstanceOf[Any])
    val patients = samples
      .select(explode(col("treatments")).as("t"))
      .filter(col("t.treatment_type").isin(cls: _*) ||
        col("t.therapeutic_agents").isin(cls: _*))
      .select(substring(col("t.submitter_id"), 1, 12).as("patient"))
      .distinct()
    samples.join(patients,
      substring(col("submitter_id"), 1, 12) === col("patient"), "left_semi")
  }
}
