package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over edge-list DataFrames — the second
  * graph family beside [[Components]]' connected components. PageRank is
  * the canonical O(rounds)-of-shuffles distributed workload: each round
  * is two keyed joins plus one aggregation, which is exactly the shape a
  * 1000-executor cluster executes well (hash-partitioned, map-side
  * combined, no driver participation beyond the loop counter).
  */
object Graphs {

  /** PageRank with a FIXED iteration count (power iteration, damping
    * `d`): pr₀(v) = 1/N; prₜ₊₁(v) = (1−d)/N + d·Σ_{u→v} prₜ(u)/outdeg(u).
    * Dangling nodes (no out-edges) simply leak their mass — the formula
    * above is applied literally, which keeps the computation a pure
    * function any engine can replay (the pr1 oracle unrolls the same
    * fixed rounds in SQL).
    *
    * Scale shape: edges, out-degrees and the (node, N) frame are
    * persisted once (each round re-reads all three); every round is
    * edges ⋈ outdeg ⋈ rank → per-dst sum — hash joins and one
    * partial+final agg, all keyed on node id, nothing driver-side. The
    * loop is built LAZILY (one action executes all rounds; same stance
    * as [[Ann]]'s Lloyd loop) because `iters` is a small constant — an
    * open-ended convergence loop would instead checkpoint per round like
    * [[Components]]. N rides a 1-row broadcast, never a collected
    * scalar. CRITICAL lineage shape: each round references the previous
    * `rank` frame exactly ONCE (the carry-forward joins the static
    * persisted node frame instead) — a second reference would double the
    * unrolled plan per round, 2^iters subtree copies by the end.
    *
    * @param edges frame with `src` and `dst` columns (any numeric/string
    *              id type; duplicates collapse to one edge)
    * @return (id, pr) — one row per node appearing in any edge
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // round-invariant (src, dst, outdeg) — hoisted so each round pays one
    // join against rank, not a rebuild of edges ⋈ outdeg
    val eo = e.join(out, "src").persist()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val nodesN = nodes.crossJoin(broadcast(nn)).persist()
    var rank = nodesN.withColumn("pr", lit(1.0) / col("n")).select("id", "pr")
    var i = 0
    while (i < iters) {
      val contrib = eo
        .join(rank.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("m"))
      rank = nodesN.join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(1.0 - damping) / col("n") +
          lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
      i += 1
    }
    graft.Caches.releaseAfterAction(e, eo, nodesN)
    rank
  }
}
