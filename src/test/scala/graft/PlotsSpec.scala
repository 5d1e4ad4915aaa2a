package graft

import java.nio.file.Files
import javax.imageio.ImageIO

import graft.sinks.Plots
import graft.functions.Survival
import org.apache.spark.sql.functions._

class PlotsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("plots").resolve(name).toString

  private def distinctColors(f: java.io.File): Int = {
    val img = ImageIO.read(f)
    val seen = scala.collection.mutable.Set[Int]()
    for (x <- 0 until img.getWidth by 3; y <- 0 until img.getHeight by 3)
      seen += img.getRGB(x, y)
    seen.size
  }

  test("boxplot PNG: renders one box per (gene, cond) with data-driven ink") {
    val frame = (for {
      g <- Seq("TP53", "BRCA1"); c <- Seq("Alive", "Dead"); i <- 1 to 40
    } yield (g, c, (i % 13).toDouble + (if (c == "Dead") 5 else 0)))
      .toDF("gene", "cond", "counts")
    val f = Plots.writeBoxplotPng(frame, tmp("box.png"))
    assert(f.exists() && f.length() > 1000)
    val img = ImageIO.read(f)
    assert(img.getWidth == 900 && img.getHeight == 600)
    assert(distinctColors(f) > 5) // background + axes + >=2 series colors
  }

  test("KM PNG: step curves + CI bands + p annotation") {
    val subjects = (for (i <- 1 to 120) yield {
      val strat = if (i % 2 == 0) "HIGH" else "LOW"
      val time = (i % 17 + 1).toDouble * (if (strat == "HIGH") 1.5 else 1.0)
      (strat, time, i % 3 min 1)
    }).toDF("strat", "time", "event")
    val curves = Survival.kmCurve(subjects, "strat", "time", "event")
    val f = Plots.writeKmPng(curves, "strat", tmp("km.png"), pValue = Some(0.023))
    assert(f.exists() && f.length() > 1000)
    assert(distinctColors(f) > 5)
  }

  test("volcano PNG: significant points get their own color") {
    val res = (1 to 500).map { i =>
      val fc = (i % 21 - 10) / 2.0
      val p = if (math.abs(fc) > 2 && i % 3 == 0) 1e-8 else 0.5
      (s"g$i", fc, p)
    }.toDF("gene", "log2fc", "padj")
    val f = Plots.writeVolcanoPng(res, "log2fc", "padj", tmp("volcano.png"))
    assert(f.exists() && f.length() > 1000)
    assert(distinctColors(f) > 4)
  }

  test("boxplot stats stay distributed: one row per (gene, cond)") {
    val frame = Seq(("g1", "a", 1.0), ("g1", "a", 2.0), ("g1", "b", 3.0))
      .toDF("gene", "cond", "counts")
    val stats = Plots.boxplotStats(frame).collect()
    assert(stats.length == 2)
    val a = stats.find(_.getString(1) == "a").get
    assert(a.getSeq[Double](a.fieldIndex("q")) == Seq(1.0, 1.25, 1.5, 1.75, 2.0))
  }
}
