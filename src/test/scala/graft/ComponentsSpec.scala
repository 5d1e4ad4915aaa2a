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

  test("an exhausted round budget throws instead of returning split labels") {
    import spark.implicits._
    // force the multi-partition loop (tiny rowsPerPartition) on a chain
    // that cannot settle in one hook+jump round
    val edges = (1L until 400L).map(i => (i, i + 1)).toDF("src", "dst")
      .repartition(8)
    val e = intercept[IllegalStateException] {
      graft.operators.Components
        .connectedComponents(edges, "src", "dst", maxRounds = 1,
          rowsPerPartition = 50L)
        .count()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("long chain converges within the round budget") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got.values.toSet === Set(1L))
    assert(got.size === 40)
  }

  test("multi-partition loop path agrees with the single-partition fixpoint") {
    // small rowsPerPartition forces the edge frame across several loop
    // partitions, exercising hook+jump propagation (the 100 TB path that
    // the single-partition union-find short-circuit otherwise hides)
    import spark.implicits._
    val chain = (1L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (200L, 201L))
    val df = chain.toDF("a", "b")
    val looped = graft.operators.Components
      .connectedComponents(df, "a", "b", rowsPerPartition = 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = graft.operators.Components
      .connectedComponents(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(looped === direct)
    assert(looped.filter(_._1 < 100).values.toSet === Set(1L))
    assert(looped(102L) === 100L && looped(201L) === 200L)
  }
}
