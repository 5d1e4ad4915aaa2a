package graft

import graft.functions.{CountCell, DiffExpression}

class DiffExpressionSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-NB counts around mean `mu`. */
  private def counts(mu: Double, n: Int, seed: Int): Seq[Double] =
    (0 until n).map { i =>
      val u = ((i * 2654435761L + seed * 97L) % 1000) / 1000.0
      math.max(0.0, math.rint(mu * (0.7 + 0.6 * u)))
    }

  private def cellsFor(gene: Long, muA: Double, muB: Double, n: Int) = {
    val a = counts(muA, n, gene.toInt).zipWithIndex.map { case (c, i) =>
      CountCell(gene, i.toLong, c, "A", 1.0)
    }
    val b = counts(muB, n, gene.toInt + 1).zipWithIndex.map { case (c, i) =>
      CountCell(gene, (n + i).toLong, c, "B", 1.0)
    }
    a ++ b
  }

  test("NB-GLM Wald recovers a 4x fold change with small p, null gene is ns") {
    val cells = (cellsFor(1L, 10, 40, 30) ++ cellsFor(2L, 25, 25, 30)).toDS()
    val res = DiffExpression.waldTest(cells, Seq("A", "B"))
      .collect().map(r => r.gene -> r).toMap
    val de = res(1L)
    assert(math.abs(de.log2fc - 2.0) < 0.35, s"log2fc=${de.log2fc}")
    assert(de.pvalue < 1e-6)
    val nul = res(2L)
    assert(math.abs(nul.log2fc) < 0.3, s"null log2fc=${nul.log2fc}")
    assert(nul.pvalue > 0.05)
  }

  test("Wald log2FC sign follows level order (factor-level contrast direction)") {
    val cells = cellsFor(1L, 40, 10, 30).toDS()
    val r = DiffExpression.waldTest(cells, Seq("A", "B")).collect().head
    assert(r.log2fc < -1.0) // B relative to reference A is lower
  }

  test("contrasts: fit once, evaluate K pairs; reference-level algebra holds") {
    val levels = Seq("L0", "L1", "L2")
    val mus = Map("L0" -> 10.0, "L1" -> 20.0, "L2" -> 40.0)
    val cells = levels.zipWithIndex.flatMap { case (l, gi) =>
      counts(mus(l), 30, gi + 5).zipWithIndex.map { case (c, i) =>
        CountCell(7L, (gi * 100 + i).toLong, c, l, 1.0)
      }
    }.toDS()
    val pairs = Seq(("L1", "L0"), ("L2", "L0"), ("L2", "L1"))
    val got = DiffExpression.contrasts(cells, levels, pairs)
      .collect().map(c => c.contrast -> c.log2fc).toMap
    assert(math.abs(got("L1_vs_L0") - 1.0) < 0.35)
    assert(math.abs(got("L2_vs_L0") - 2.0) < 0.35)
    // transitivity of coefficients from a single fit:
    assert(math.abs(got("L2_vs_L0") - got("L1_vs_L0") - got("L2_vs_L1")) < 1e-9)
  }

  test("size factors act as offsets: doubling a sample's sf halves its effect") {
    // same counts, but B samples carry sf=2 -> normalized B mean halves
    val base = cellsFor(3L, 20, 20, 30)
    val cells = base.map(c => if (c.cond == "B") c.copy(sf = 2.0) else c).toDS()
    val r = DiffExpression.waldTest(cells, Seq("A", "B")).collect().head
    assert(r.log2fc < -0.6 && r.log2fc > -1.4, s"log2fc=${r.log2fc}")
  }

  test("results are deterministic across repartitioning") {
    val cells = cellsFor(9L, 15, 30, 25)
    val a = DiffExpression.waldTest(cells.toDS().repartition(1), Seq("A", "B")).collect().head
    val b = DiffExpression.waldTest(cells.toDS().repartition(7), Seq("A", "B")).collect().head
    assert(a == b)
  }
}
