package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.TcgaTables

/** Deterministic TCGA-shaped fixtures (FIXTURES.md §B): seeded pseudo-NB
  * counts with planted differential genes, clinical NULLs, and a ragged
  * nested treatments array. No RNG object — a splitmix-style integer hash
  * keeps every value a pure function of (seed, gene, sample).
  */
object TcgaFixtures {

  val nGenes = 120
  val nSamples = 48

  /** Genes: ENSG ids; every 10th gene has a distinctive name we plant DE on. */
  private def geneId(g: Int) = f"ENSG${g}%011d"
  private def geneName(g: Int) = if (g % 10 == 0) s"DEG$g" else s"GENE$g"
  private def barcode(s: Int) = f"TCGA-AB-${s}%04d-01A"
  private def submitter(s: Int) = f"TCGA-AB-${s}%04d"

  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def u01(x: Long): Double = (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Tumor samples are the odd half; DEG genes are 4x up in tumor. */
  private def isTumor(s: Int) = s % 2 == 1

  /** True NB mean-variance counts: Var = μ + αμ² with α = 0.05, via a
    * lognormal gene×sample effect of variance α (the Gamma mixing stand-in)
    * plus a Gaussian-approximated Poisson draw. The DE machinery's
    * statistical properties (FPR, shrinkage behavior) are only testable
    * against noise the NB GLM actually models. */
  private val dispAlpha = 0.05

  private def gauss(key: Long, k: Long): Double = {
    val u1 = math.max(u01(key * 31 + k), 1e-12)
    val u2 = u01(key * 37 + k + 1000)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private def count(g: Int, s: Int): Long = {
    val base = 20.0 + (g % 7) * 15.0
    val fold = if (g % 10 == 0 && isTumor(s)) 4.0 else 1.0
    val libSize = 0.6 + 0.8 * (s % 5) / 4.0 // per-sample depth variation
    if (g % 17 == 0) (if (s % 13 == 0) 1L else 0L) // low-count genes for D1
    else {
      val mu = base * fold * libSize
      val sigma = math.sqrt(math.log1p(dispAlpha))
      val key = g.toLong * 100003L + s
      val m = mu * math.exp(sigma * gauss(key, 1) - sigma * sigma / 2)
      math.max(0L, math.rint(m + math.sqrt(math.max(m, 0.0)) * gauss(key, 2)).toLong)
    }
  }

  def tables(spark: SparkSession): TcgaTables = {
    import spark.implicits._
    val expression: DataFrame = (for {
      g <- 0 until nGenes
      s <- 0 until nSamples
    } yield (geneId(g), barcode(s), count(g, s))).toDF("gene_id", "barcode", "count")
    val genes = (0 until nGenes).map(g => (geneId(g), geneName(g)))
      .toDF("gene_id", "gene_name")
    val samples = (0 until nSamples).map { s =>
      val tumor = isTumor(s)
      val vital = if (s % 11 == 3) null else if (u01(s + 777L) < 0.55) "Alive" else "Dead"
      val stage = if (s % 9 == 4) null
        else Seq("Stage I", "Stage IIA", "Stage IIB", "Stage IIIC", "Stage IV")(s % 5)
      val subtype = Seq("Normal", "Basal", "Her2", "LumA", "LumB")(s % 5)
      val death = if (vital == "Dead") (200.0 + 40.0 * (s % 20)): java.lang.Double else null
      val followup = if (vital == "Alive") (300.0 + 55.0 * (s % 15)): java.lang.Double else null
      val treatments =
        if (s % 4 == 0) Seq.empty[(String, String, String)]
        else Seq.tabulate(1 + s % 3)(i =>
          (submitter(s),
            if ((s + i) % 2 == 0) "Chemotherapy" else "Radiation Therapy",
            if ((s + i) % 3 == 0) "Tamoxifen" else "Cisplatin"))
      (barcode(s), submitter(s), vital,
        if (tumor) "TP" else "NT", stage, subtype, death, followup, treatments)
    }.toDF("barcode", "submitter_id", "vital_status", "short_letter_code",
      "ajcc_pathologic_stage", "paper_brca_subtype_pam50",
      "days_to_death", "paper_days_to_last_followup", "treatments")
      .withColumnRenamed("treatments", "treatments_raw")
      .selectExpr("barcode", "submitter_id", "vital_status", "short_letter_code",
        "ajcc_pathologic_stage", "paper_brca_subtype_pam50",
        "days_to_death", "paper_days_to_last_followup",
        """transform(treatments_raw, t -> named_struct(
             'submitter_id', t._1, 'treatment_type', t._2,
             'therapeutic_agents', t._3)) AS treatments""")
    TcgaTables(expression, genes, samples)
  }
}
