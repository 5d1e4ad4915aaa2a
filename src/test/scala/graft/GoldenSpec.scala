package graft

import scala.io.Source
import graft.queries.QueryCatalog

/** §5.4 — end-to-end golden tests: pipeline outputs on sf0.001 compared to
  * committed CSVs (deterministic: fixed data seed, UTC, rounded doubles,
  * canonical column/row ordering). Regenerate with Verify at sf0.001 +
  * the canonicalization below if a pipeline's semantics change on purpose. */
class GoldenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val golden = Seq("de1_pipeline_wilcoxon", "d10_km_curve",
    "km2_logrank_by_gene", "x2_quality_score")

  /** Canonical form: columns sorted by name, rows sorted by all columns,
    * everything stringified the way pandas' to_csv wrote the goldens. */
  private def canonical(name: String): Seq[String] = {
    val df = QueryCatalog.byName(name).run(spark, dir)
    val cols = df.columns.sorted
    val proj = df.select(cols.map(df(_)): _*)
    proj.collect().map { r =>
      cols.indices.map { i =>
        val v = r.get(i)
        if (r.isNullAt(i)) ""
        else v match {
          case d: Double =>
            if (d == math.rint(d) && math.abs(d) < 1e15) {
              val l = d.toLong
              s"$l.0"
            } else d.toString
          case x => x.toString
        }
      }.mkString(",")
    }.sorted.toSeq
  }

  golden.foreach { name =>
    test(s"golden: $name matches committed sf0.001 output") {
      val url = getClass.getResource(s"/golden/$name.csv")
      assert(url != null, s"missing golden file for $name")
      val src = Source.fromURL(url)
      val lines = try src.getLines().drop(1).map(canonLine).toVector finally src.close()
      val got = canonical(name).map(canonLine)
      assert(got.size == lines.size, s"row count ${got.size} vs golden ${lines.size}")
      got.sorted.zip(lines.sorted).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"row $i differs:\n  got    $g\n  golden $e")
      }
    }
  }

  /** Normalize numeric token spellings (pandas "1.0" vs Spark "1", empty
    * trailing fields) so the compare is value-based. */
  private def canonLine(s: String): String =
    s.split(",", -1).map { tok =>
      if (tok.matches("-?\\d+\\.0")) tok.dropRight(2)
      else if (tok.matches("-?\\d+\\.\\d+")) {
        // strip trailing zeros pandas/Scala print differently
        tok.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      } else tok
    }.mkString(",")
}
