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

  private def pixels(f: java.io.File): Seq[Int] = {
    val img = ImageIO.read(f)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y)
  }

  test("KM PNG: median-survival hv guides draw gray dashes at S=0.5") {
    val subjects = (for (i <- 1 to 80) yield {
      val strat = if (i % 2 == 0) "HIGH" else "LOW"
      ((strat, (i % 11 + 1).toDouble, 1))
    }).toDF("strat", "time", "event")
    val curves = Survival.kmCurve(subjects, "strat", "time", "event")
    // every subject is an event → both curves cross 0.5 → guides draw
    val on = Plots.writeKmPng(curves, "strat", tmp("km_med.png"))
    val off = Plots.writeKmPng(curves, "strat", tmp("km_nomed.png"),
      medianLines = false)
    val gray = java.awt.Color.GRAY.getRGB
    val onGray = pixels(on).count(_ == gray)
    assert(onGray > 50, s"expected median guide ink, got $onGray gray px")
    assert(onGray > pixels(off).count(_ == gray))
    // the horizontal guide sits on the S=0.5 raster row: y1 - 0.5*(y1-y0)
    val img = ImageIO.read(on)
    val y05 = 550 - ((0.5 / 1.0) * (550 - 40)).round.toInt
    assert((70 until 890 by 2).exists(x => img.getRGB(x, y05) == gray))
  }

  test("KM PNG: legend renders n= counts when supplied") {
    val subjects = (for (i <- 1 to 60) yield
      ((if (i % 2 == 0) "HIGH" else "LOW"), (i % 7 + 1).toDouble, 1))
      .toDF("strat", "time", "event")
    val curves = Survival.kmCurve(subjects, "strat", "time", "event")
    val bare = Plots.writeKmPng(curves, "strat", tmp("km_bare.png"),
      medianLines = false)
    val withN = Plots.writeKmPng(curves, "strat", tmp("km_n.png"),
      counts = Map("HIGH" -> 30L, "LOW" -> 30L), medianLines = false)
    // the longer labels add legend ink; everything else is identical
    def legendInk(f: java.io.File): Int = {
      val img = ImageIO.read(f)
      (for (y <- 40 until 90; x <- 95 until 300)
        yield img.getRGB(x, y)).count(_ == java.awt.Color.BLACK.getRGB)
    }
    assert(legendInk(withN) > legendInk(bare))
  }

  test("boxplot PNG: p.signif brackets draw for significant genes, hide.ns") {
    val frame = (for {
      g <- Seq("TP53", "BRCA1"); c <- Seq("Alive", "Dead"); i <- 1 to 40
    } yield (g, c, (i % 13).toDouble + (if (c == "Dead") 5 else 0)))
      .toDF("gene", "cond", "counts")
    val plain = Plots.writeBoxplotPng(frame, tmp("box_plain.png"))
    val starred = Plots.writeBoxplotPng(frame, tmp("box_sig.png"),
      signif = Map("TP53" -> "***", "BRCA1" -> "ns"))
    val allNs = Plots.writeBoxplotPng(frame, tmp("box_ns.png"),
      signif = Map("TP53" -> "ns", "BRCA1" -> "ns"))
    // all-ns (the F12 fallback) renders EXACTLY the un-annotated plot
    assert(java.util.Arrays.equals(
      Files.readAllBytes(allNs.toPath), Files.readAllBytes(plain.toPath)))
    // a drawn bracket adds black ink above the boxes
    val black = java.awt.Color.BLACK.getRGB
    assert(pixels(starred).count(_ == black) > pixels(plain).count(_ == black))
  }

  test("golden byte hashes: boxplot/KM/volcano renders are pinned") {
    // Presentation-edge pin (r9 verdict #6): the sinks are deterministic
    // JDK-only java2d, and the structural tests above can't see a moved
    // axis, a palette swap, or a broken bracket that keeps ink counts
    // similar. A byte hash per plot kind makes ANY render change visible.
    // Regenerate with `GOLDEN_REGEN=1 sbt "testOnly graft.PlotsSpec"`
    // (same protocol as GoldenSpec) after an INTENDED presentation change
    // — and expect a legitimate regen if the JDK/font stack changes,
    // since text rasterization is pinned by the container's JDK 17.
    val box = Plots.writeBoxplotPng(
      (for {
        g <- Seq("TP53", "BRCA1"); c <- Seq("Alive", "Dead"); i <- 1 to 40
      } yield (g, c, (i % 13).toDouble + (if (c == "Dead") 5 else 0)))
        .toDF("gene", "cond", "counts"),
      tmp("gold_box.png"), signif = Map("TP53" -> "***", "BRCA1" -> "ns"))
    val km = Plots.writeKmPng(
      Survival.kmCurve(
        (for (i <- 1 to 120) yield {
          val strat = if (i % 2 == 0) "HIGH" else "LOW"
          (strat, (i % 17 + 1).toDouble * (if (strat == "HIGH") 1.5 else 1.0),
            i % 3 min 1)
        }).toDF("strat", "time", "event"),
        "strat", "time", "event"),
      "strat", tmp("gold_km.png"), pValue = Some(0.023),
      counts = Map("HIGH" -> 60L, "LOW" -> 60L))
    val volcano = Plots.writeVolcanoPng(
      (1 to 500).map { i =>
        val fc = (i % 21 - 10) / 2.0
        (s"g$i", fc, if (math.abs(fc) > 2 && i % 3 == 0) 1e-8 else 0.5)
      }.toDF("gene", "log2fc", "padj"),
      "log2fc", "padj", tmp("gold_volcano.png"))
    def md5(f: java.io.File): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
    val got = Seq("boxplot" -> md5(box), "km" -> md5(km),
      "volcano" -> md5(volcano))
    val path = java.nio.file.Paths.get("src/test/resources/golden/plots.md5")
    if (sys.env.contains("GOLDEN_REGEN")) {
      Files.createDirectories(path.getParent)
      Files.writeString(path,
        got.map { case (k, v) => s"$k $v" }.mkString("", "\n", "\n"))
    } else {
      val want = Files.readString(path).linesIterator
        .filter(_.nonEmpty).map(_.split(" ")).map(a => a(0) -> a(1)).toMap
      got.foreach { case (kind, h) =>
        assert(want(kind) == h,
          s"$kind PNG bytes changed (got $h, pinned ${want(kind)}) — if the " +
            "presentation change is intended, regenerate with GOLDEN_REGEN=1")
      }
    }
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
