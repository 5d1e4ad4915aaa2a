package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.operators.Graphs

class GraphsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  /** In-test reference: the same literal fixed-round power iteration. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => pr(src) / outdeg(src) }.sum
      }
      pr = nodes.map(v => v -> ((1.0 - d) / n + d * contrib.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("uniform ring stays uniform at every iteration count") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graphs.pageRank(edges, iters = 7).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.keySet shouldBe Set(1L, 2L, 3L)
    pr.values.foreach(_ shouldBe (1.0 / 3) +- 1e-12)
  }

  test("hub graph matches the literal reference iteration") {
    // two spokes into a hub, hub back to one spoke, one dangling sink
    val edges = Seq((1L, 10L), (2L, 10L), (10L, 1L), (1L, 99L))
    val got = Graphs.pageRank(edges.toDF("src", "dst"), iters = 5, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, 5, 0.85)
    got.keySet shouldBe want.keySet
    got.foreach { case (id, pr) => pr shouldBe want(id) +- 1e-12 }
    // the hub out-ranks its spokes
    got(10L) should be > got(2L)
  }

  test("duplicate edges collapse and results are layout-invariant") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val dup = (base ++ base ++ base).toDF("src", "dst").repartition(7)
    val got = Graphs.pageRank(dup, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(base, 4, 0.85)
    got.foreach { case (id, pr) => pr shouldBe want(id) +- 1e-12 }
  }

  test("mass conservation without dangling nodes") {
    // every node has an out-edge → total pr stays 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (4L, 2L))
      .toDF("src", "dst")
    val total = Graphs.pageRank(edges, iters = 6).agg(sum("pr")).head.getDouble(0)
    total shouldBe 1.0 +- 1e-9
  }
}
