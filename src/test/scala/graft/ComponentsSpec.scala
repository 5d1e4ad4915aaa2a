package graft

import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
        edges.toDF("a", "b").repartition(5), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain transitivity: A-B, B-C, C-D all land in component min(A)") {
    val got = comps(Seq((4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("separate components stay separate; cycles converge") {
    val got = comps(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // triangle
      (10L, 11L), // pair
      (20L, 21L), (21L, 22L), (22L, 20L), (22L, 23L))) // cycle + tail
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L)
    assert(Seq(20L, 21L, 22L, 23L).forall(got(_) === 20L))
  }

  test("deterministic under edge order and partitioning") {
    val e = Seq((5L, 9L), (9L, 2L), (7L, 8L), (2L, 11L))
    assert(comps(e) === comps(e.reverse.map { case (a, b) => (b, a) }))
  }

  test("empty edge set: empty result, no crash") {
    assert(comps(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("long chain converges within the round budget") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got.values.toSet === Set(1L))
    assert(got.size === 40)
  }
}
