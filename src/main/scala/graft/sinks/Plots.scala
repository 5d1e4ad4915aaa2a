package graft.sinks

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** A7 — the PNG plot sink (`ggsave(...)` at vital_status_DESeq.R:144,
  * surv_analysis_median_exp.R:168, drug_km_median_exp.R:127), JDK-only
  * (java2d + ImageIO, no native or third-party codecs).
  *
  * Scale stance: plotting is an edge sink — every renderer takes a
  * PLOT-READY frame whose cardinality is bounded by the visual, not the
  * data (box stats per (gene, group); KM curve rows per event time; one
  * point per gene for the volcano). The five-number summaries are computed
  * distributed by Spark; only the bounded stats frame is ever collected.
  */
object Plots {

  /** Distributed five-number summary per (gene, cond) — the only
    * aggregation a boxplot needs; collect is O(genes × groups). */
  def boxplotStats(frame: DataFrame): DataFrame =
    frame.groupBy(col("gene"), col("cond")).agg(
      expr("percentile(counts, array(0.0, 0.25, 0.5, 0.75, 1.0))").as("q"),
      count(lit(1)).as("n"))

  private val seriesColors = Array(
    new Color(0x1b, 0x9e, 0x77), new Color(0xd9, 0x5f, 0x02),
    new Color(0x75, 0x70, 0xb3), new Color(0xe7, 0x29, 0x8a),
    new Color(0x66, 0xa6, 0x1e), new Color(0xe6, 0xab, 0x02))

  private case class Canvas(img: BufferedImage, g: Graphics2D,
      x0: Int, y0: Int, x1: Int, y1: Int, // plot rect (y0 top)
      xMin: Double, xMax: Double, yMin: Double, yMax: Double) {
    def px(x: Double): Int = x0 + ((x - xMin) / (xMax - xMin) * (x1 - x0)).round.toInt
    def py(y: Double): Int = y1 - ((y - yMin) / (yMax - yMin) * (y1 - y0)).round.toInt
  }

  /** Axes, ticks, labels on a fresh white canvas. */
  private def canvas(w: Int, h: Int, xMin: Double, xMax: Double,
      yMin: Double, yMax: Double, title: String, xLab: String,
      yLab: String): Canvas = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
    val (x0, y0, x1, y1) = (70, 40, w - 20, h - 50)
    val c = Canvas(img, g, x0, y0, x1, y1, xMin, xMax, yMin, yMax)
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 14))
    g.drawString(title, x0, 25)
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 11))
    g.drawLine(x0, y1, x1, y1); g.drawLine(x0, y0, x0, y1)
    // ~5 "nice" ticks per axis
    def ticks(lo: Double, hi: Double): Seq[Double] = {
      val raw = (hi - lo) / 5.0
      val mag = math.pow(10, math.floor(math.log10(math.max(raw, 1e-300))))
      val step = Seq(1, 2, 5, 10).map(_ * mag).find(_ >= raw).getOrElse(raw)
      val first = math.ceil(lo / step) * step
      Iterator.iterate(first)(_ + step).takeWhile(_ <= hi + step * 1e-9).toSeq
    }
    for (t <- ticks(xMin, xMax)) {
      val x = c.px(t)
      g.drawLine(x, y1, x, y1 + 4)
      val s = f"$t%.4g"
      g.drawString(s, x - g.getFontMetrics.stringWidth(s) / 2, y1 + 17)
    }
    for (t <- ticks(yMin, yMax)) {
      val y = c.py(t)
      g.drawLine(x0 - 4, y, x0, y)
      val s = f"$t%.4g"
      g.drawString(s, x0 - 8 - g.getFontMetrics.stringWidth(s), y + 4)
    }
    g.drawString(xLab, (x0 + x1) / 2 - g.getFontMetrics.stringWidth(xLab) / 2, h - 8)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 14, (y0 + y1) / 2)
    g.drawString(yLab, 14 - g.getFontMetrics.stringWidth(yLab) / 2, (y0 + y1) / 2)
    g.setTransform(old)
    c
  }

  private def finish(c: Canvas, out: String): File = {
    c.g.dispose()
    val f = new File(out)
    Option(f.getParentFile).foreach(_.mkdirs())
    ImageIO.write(c.img, "png", f)
    f
  }

  /** Grouped boxplots (one box per (gene, cond)), whiskers at min/max —
    * the `ggboxplot(counts ~ cond, facet by gene)` shape. `frame` is the
    * long `(gene, cond, counts)` plot frame (api.Tcga.boxplotFrame).
    *
    * @param signif per-gene significance band for the bracket annotation
    *               (`stat_pvalue_manual(stat_test, label="p.signif",
    *               hide.ns=T)`, BRCA_path_stage_DESeq.R:199 /
    *               vital_status_DESeq.R:135-141): a bracket spanning the
    *               gene's boxes with the band label, drawn only for bands
    *               other than "ns" (hide.ns) — so the all-ns fallback
    *               (`Tcga.allNonSignificant`, F12) renders bracket-free
    *               through the SAME call. Feed
    *               `Tcga.wilcoxonWithDeBanding`'s `wilcoxon_p_signif`
    *               keyed by gene_name. */
  def writeBoxplotPng(frame: DataFrame, out: String,
      signif: Map[String, String] = Map.empty,
      w: Int = 900, h: Int = 600): File = {
    val stats = boxplotStats(frame)
      .collect().map { r =>
        val q = r.getSeq[Double](r.fieldIndex("q"))
        (r.getString(0), r.getString(1), q)
      }.sortBy(t => (t._1, t._2))
    require(stats.nonEmpty, "empty boxplot frame")
    val yLo = stats.map(_._3.head).min
    val yHi0 = stats.map(_._3.last).max
    // reserve headroom for the brackets when any non-ns band will draw
    val drawn = signif.filter { case (g, band) =>
      band != "ns" && stats.exists(_._1 == g)
    }
    val yHi = if (drawn.isEmpty) yHi0 else yHi0 + (yHi0 - yLo) * 0.12
    val pad = math.max((yHi - yLo) * 0.05, 1e-9)
    val c = canvas(w, h, 0, stats.length, yLo - pad, yHi + pad,
      "expression by condition", "", "vst counts")
    val conds = stats.map(_._2).distinct.sorted
    stats.zipWithIndex.foreach { case ((gene, cond, q), i) =>
      val Seq(q0, q1, q2, q3, q4) = q.toSeq
      val (xl, xr) = (c.px(i + 0.2), c.px(i + 0.8))
      val xm = (xl + xr) / 2
      val col = seriesColors(conds.indexOf(cond) % seriesColors.length)
      c.g.setColor(col)
      c.g.setStroke(new BasicStroke(1.5f))
      c.g.drawLine(xm, c.py(q0), xm, c.py(q1)) // lower whisker
      c.g.drawLine(xm, c.py(q3), xm, c.py(q4)) // upper whisker
      c.g.drawRect(xl, c.py(q3), xr - xl, c.py(q1) - c.py(q3))
      c.g.setStroke(new BasicStroke(2.5f))
      c.g.drawLine(xl, c.py(q2), xr, c.py(q2)) // median
      c.g.setStroke(new BasicStroke(1f))
      c.g.setColor(Color.DARK_GRAY)
      val lab = s"$gene/$cond"
      c.g.drawString(lab.take(14),
        xm - c.g.getFontMetrics.stringWidth(lab.take(14)) / 2, c.y1 + 30)
    }
    // p.signif brackets: per annotated gene, a bracket spanning its boxes
    // just above the gene's tallest whisker, labelled with the band
    drawn.foreach { case (gene, band) =>
      val idx = stats.zipWithIndex.filter(_._1._1 == gene)
      val top = idx.map(_._1._3.last).max
      val yB = c.py(top + (yHi - yLo) * 0.04)
      val (xl, xr) = (c.px(idx.head._2 + 0.5), c.px(idx.last._2 + 0.5))
      c.g.setColor(Color.BLACK)
      c.g.setStroke(new BasicStroke(1f))
      c.g.drawLine(xl, yB, xr, yB)
      c.g.drawLine(xl, yB, xl, yB + 5)
      c.g.drawLine(xr, yB, xr, yB + 5)
      c.g.drawString(band,
        (xl + xr) / 2 - c.g.getFontMetrics.stringWidth(band) / 2, yB - 4)
    }
    finish(c, out)
  }

  /** Kaplan–Meier step curves with CI bands per stratum, optional log-rank
    * p annotation — the `ggsurvplot(s1, pval=T, conf.int=T,
    * surv.median.line="hv", legend.labs=paste(..., "n=", n))` shape
    * (surv_analysis_median_exp.R:143-163). `curves` is Survival.kmCurve
    * output (stratCol, time, survival, ci_lo, ci_hi).
    *
    * @param counts  per-stratum subject counts for the legend's `n=`
    *                labels (the reference builds them from `sum(...)`
    *                at surv_analysis_median_exp.R:143-144; feed
    *                `d9_group_counts` output). Strata absent from the
    *                map keep a bare label.
    * @param medianLines draw the "hv" median-survival guides
    *                (surv_analysis_median_exp.R:158): one horizontal
    *                S = 0.5 reference plus a vertical drop at each
    *                stratum's median (first time S ≤ 0.5, the same
    *                definition as [[graft.functions.Survival
    *                .medianSurvival]]); strata whose curve never
    *                reaches 0.5 draw no drop, and the horizontal is
    *                omitted when no stratum does. */
  def writeKmPng(curves: DataFrame, stratCol: String, out: String,
      pValue: Option[Double] = None, counts: Map[String, Long] = Map.empty,
      medianLines: Boolean = true, w: Int = 900, h: Int = 600): File = {
    val rows = curves
      .select(col(stratCol).cast("string"), col("time").cast("double"),
        col("survival"), col("ci_lo"), col("ci_hi"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .groupBy(_._1).toSeq.sortBy(_._1)
    require(rows.nonEmpty, "empty KM frame")
    val tMax = rows.flatMap(_._2).map(_._2).max
    val c = canvas(w, h, 0, math.max(tMax, 1e-9), 0, 1.0,
      "Kaplan-Meier survival", "time", "S(t)")
    // median-survival "hv" guides UNDER the curves (same ulp guard as
    // Survival.medianSurvival; the per-stratum medians recompute here on
    // the already-collected plot frame — no extra Spark job)
    if (medianLines) {
      val medians = rows.flatMap { case (_, pts) =>
        pts.filter(_._3 <= 0.5 + 1e-12).map(_._2).minOption
      }
      if (medians.nonEmpty) {
        c.g.setColor(Color.GRAY)
        c.g.setStroke(new BasicStroke(1f, BasicStroke.CAP_BUTT,
          BasicStroke.JOIN_MITER, 10f, Array(4f, 4f), 0f))
        val y05 = c.py(0.5)
        c.g.drawLine(c.x0, y05, c.px(medians.max), y05)
        medians.foreach(m => c.g.drawLine(c.px(m), y05, c.px(m), c.py(0.0)))
        c.g.setStroke(new BasicStroke(1f))
      }
    }
    rows.zipWithIndex.foreach { case ((strat, pts0), si) =>
      val pts = pts0.sortBy(_._2)
      val col = seriesColors(si % seriesColors.length)
      // CI band: translucent fill between lo/hi steps
      c.g.setColor(new Color(col.getRed, col.getGreen, col.getBlue, 40))
      var prev = (0.0, 1.0, 1.0) // (t, lo, hi)
      for ((_, t, _, lo, hi) <- pts if lo.isDefined && hi.isDefined) {
        val xa = c.px(prev._1); val xb = c.px(t)
        c.g.fillRect(xa, c.py(prev._3), math.max(xb - xa, 1),
          math.max(c.py(prev._2) - c.py(prev._3), 1))
        prev = (t, lo.get, hi.get)
      }
      // flush the last event's band to the plot edge (the step line below
      // draws its tail the same way)
      c.g.fillRect(c.px(prev._1), c.py(prev._3),
        math.max(c.x1 - c.px(prev._1), 1),
        math.max(c.py(prev._2) - c.py(prev._3), 1))
      // survival step line
      c.g.setColor(col)
      c.g.setStroke(new BasicStroke(2f))
      var (pt, ps) = (0.0, 1.0)
      for ((_, t, s, _, _) <- pts) {
        c.g.drawLine(c.px(pt), c.py(ps), c.px(t), c.py(ps)) // horizontal
        c.g.drawLine(c.px(t), c.py(ps), c.px(t), c.py(s))   // drop
        pt = t; ps = s
      }
      c.g.drawLine(c.px(pt), c.py(ps), c.x1, c.py(ps)) // tail
      // legend — "HIGH, n=123" when counts are supplied (the reference's
      // legend.labs = paste(strat, ", n=", n) at
      // surv_analysis_median_exp.R:143-144)
      c.g.fillRect(c.x0 + 10, c.y0 + 8 + si * 16, 10, 10)
      c.g.setColor(Color.BLACK)
      val lab = counts.get(strat).map(n => s"$strat, n=$n").getOrElse(strat)
      c.g.drawString(lab, c.x0 + 25, c.y0 + 17 + si * 16)
    }
    pValue.foreach { p =>
      c.g.setColor(Color.BLACK)
      c.g.drawString(f"log-rank p = $p%.4g", c.x0 + 10, c.y1 - 10)
    }
    finish(c, out)
  }

  /** Volcano scatter: effect size vs −log10 adjusted p, significant points
    * colored — one point per gene, cardinality bounded by the gene dim. */
  def writeVolcanoPng(results: DataFrame, fcCol: String, padjCol: String,
      out: String, fcThresh: Double = 1.0, pThresh: Double = 0.05,
      w: Int = 900, h: Int = 600): File = {
    val pts = results
      .select(col(fcCol).cast("double"), col(padjCol).cast("double"))
      .filter(col(fcCol).isNotNull && col(padjCol).isNotNull)
      .collect().map(r => (r.getDouble(0), -math.log10(math.max(r.getDouble(1), 1e-300))))
    require(pts.nonEmpty, "empty volcano frame")
    val xAbs = math.max(pts.map(p => math.abs(p._1)).max, fcThresh) * 1.05
    val yHi = math.max(pts.map(_._2).max, -math.log10(pThresh)) * 1.05
    val c = canvas(w, h, -xAbs, xAbs, 0, yHi,
      "volcano", s"log2 fold change", "-log10 padj")
    val yCut = -math.log10(pThresh)
    c.g.setColor(Color.LIGHT_GRAY)
    c.g.drawLine(c.x0, c.py(yCut), c.x1, c.py(yCut))
    c.g.drawLine(c.px(-fcThresh), c.y0, c.px(-fcThresh), c.y1)
    c.g.drawLine(c.px(fcThresh), c.y0, c.px(fcThresh), c.y1)
    for ((fc, nlp) <- pts) {
      val sig = nlp >= yCut && math.abs(fc) >= fcThresh
      c.g.setColor(if (sig) seriesColors(3) else new Color(120, 120, 120, 90))
      c.g.fillOval(c.px(fc) - 2, c.py(nlp) - 2, 4, 4)
    }
    finish(c, out)
  }
}
