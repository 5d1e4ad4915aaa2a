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

  test("checkpointing bounds plan depth at high iters without changing values") {
    val edges = Seq((1L, 10L), (2L, 10L), (10L, 1L), (1L, 99L))
    def planSize(iters: Int, every: Int): Int =
      Graphs.pageRank(edges.toDF("src", "dst"), iters, 0.85, every)
        .queryExecution.analyzed.collect { case p => p }.size
    // lineage truncation: 50 rounds at checkpointEvery=10 must plan like
    // ~10 rounds, NOT grow linearly to 50 (the r5 advisor's pr1 note)
    val bounded = planSize(iters = 50, every = 10)
    val linear = planSize(iters = 50, every = 1000)
    assert(bounded < linear / 3, s"bounded=$bounded linear=$linear")
    // and the values are bit-identical to the uncheckpointed run
    val a = Graphs.pageRank(edges.toDF("src", "dst"), 25, 0.85, checkpointEvery = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graphs.pageRank(edges.toDF("src", "dst"), 25, 0.85, checkpointEvery = 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  // ------------------------------------------------------ triangle counts

  /** In-test reference: brute-force canonical-triple enumeration. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct.toSet
    val nodes = (e.map(_._1) ++ e.map(_._2)).toSeq.sorted
    val tris = for {
      x <- nodes; y <- nodes if y > x && e((x, y))
      z <- nodes if z > y && e((x, z)) && e((y, z))
    } yield (x, y, z)
    tris.flatMap(t => Seq(t._1, t._2, t._3)).groupBy(identity)
      .map { case (id, xs) => id -> xs.size.toLong }
  }

  test("triangles: K4 gives every node 3 triangles") {
    val edges = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val got = Graphs.triangleCounts(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("triangles: a square has none (empty result)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    Graphs.triangleCounts(edges).count() shouldBe 0L
  }

  test("triangles: duplicates, reversed copies and self-loops collapse") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val noisy = (base ++ base.map(_.swap) ++ Seq((2L, 2L)) ++ base)
      .toDF("src", "dst").repartition(5)
    val got = Graphs.triangleCounts(noisy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  // ------------------------------------------------------------- k-core

  test("kCore: K4 is its own 3-core, every degree 3") {
    val edges = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val got = Graphs.kCore(edges, k = 3, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("kCore: pendant peels off, triangle survives as the 2-core") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graphs.kCore(edges, k = 2, rounds = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("kCore: a path fully unravels round by round") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    // round 1 drops the endpoints, round 2 the next pair — nothing left
    Graphs.kCore(edges, k = 2, rounds = 2).count() shouldBe 0L
    // a single round only peels the outermost shell
    val one = Graphs.kCore(edges, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0)).toSet
    one shouldBe Set(2L, 3L, 4L)
  }

  // ---------------------------------------------------------------- BFS

  test("bfsLevels: hop distances on a path, capped at maxDepth") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val src = Seq(1L).toDF("id")
    val got = Graphs.bfsLevels(edges, src, maxDepth = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 2L)
  }

  test("bfsLevels: multiple sources take the nearest, edges are undirected") {
    // 5→4→3→2→1 given reversed: undirected canonicalization must not care
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)).toDF("src", "dst")
    val src = Seq(1L, 5L).toDF("id")
    val got = Graphs.bfsLevels(edges, src, maxDepth = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L)
  }

  test("bfsLevels: disconnected component stays unreached") {
    val edges = Seq((1L, 2L), (8L, 9L)).toDF("src", "dst")
    val got = Graphs.bfsLevels(edges, Seq(1L).toDF("id"), maxDepth = 3)
      .collect().map(r => r.getLong(0)).toSet
    got shouldBe Set(1L, 2L)
  }

  test("triangles: hub star with cross edges matches brute force") {
    // hub 0 to 8 spokes, a few chords among spokes — exercises the
    // degree orientation (the hub must never be a wedge apex)
    val edges = (1L to 8L).map(i => (0L, i)) ++
      Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (1L, 3L))
    val got = Graphs.triangleCounts(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe refTriangles(edges)
  }
}
