package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (Dedup.minhashCandidates, jaccardPairs, …) into dedup CLUSTERS:
  * duplicate relations are transitive in effect (A≈B, B≈C ⇒ keep one of
  * {A,B,C}), so keeper election needs the component, not the pair.
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with its own id; each round (1) hooks: every node takes
  * the minimum label among itself and its neighbours — one shuffle join +
  * hash agg; (2) jumps: every node replaces its label with its label's
  * label (path halving) — one self-join. Hooking alone needs O(diameter)
  * rounds (a 1M-node chain would need 1M rounds); the jump halves label
  * paths so convergence is O(log n) rounds — the standard star-contraction
  * family (Kiveris et al. "Connected Components in MapReduce and Beyond"
  * describes the same trade).
  *
  * Each round ends in `localCheckpoint(eager)`: the label frame is
  * node-sized (bounded by docs that HAVE a near-dup, far below the
  * corpus), and truncating lineage there keeps round N's plan constant
  * size — without it the nested join lineage grows per round until plan
  * stringification alone OOMs the driver. On a production cluster prefer
  * `spark.sparkContext.setCheckpointDir` + `checkpoint()` if executor
  * loss during the loop must be recoverable.
  *
  * Determinism: labels are min() folds of node ids — associative,
  * partitioning-independent, bit-stable.
  *
  * @param edges undirected pair list (one row per pair, either order)
  * @return `(id, comp)` — one row per node appearing in `edges`, `comp` =
  *         the minimum node id of its component
  */
object Components {

  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct()
      .persist()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      // hook: fold the neighbour minimum into the node's own label (the
      // pre-round label rides along as `old` for the convergence metric)
      val neigh = sym.join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("id")).agg(min(col("comp")).as("ncomp"))
      val hooked = labels.alias("l")
        .join(neigh.alias("n"), col("l.id") === col("n.id"), "left")
        .select(col("l.id").as("id"),
          least(col("l.comp"), coalesce(col("n.ncomp"), col("l.comp"))).as("comp"),
          col("l.comp").as("old"))
      // jump: comp := comp(comp) — path halving. The convergence count
      // rides the SAME action as the checkpoint via Observation: one job
      // per round total, no separate count pass.
      val obs = new org.apache.spark.sql.Observation()
      val next = hooked.alias("x")
        .join(hooked.select(col("id").as("jid"), col("comp").as("jcomp")).alias("j"),
          col("x.comp") === col("j.jid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("j.jcomp"), col("x.comp")).as("comp"),
          col("x.old").as("old"))
        .observe(obs, // coalesce: sum over an EMPTY label frame is NULL
          coalesce(sum(when(col("comp") =!= col("old"), 1L).otherwise(0L)),
            lit(0L)).as("changed"))
        .drop("old")
        .localCheckpoint(true) // constant-size plan + one action per round
      labels = next
      converged = obs.get("changed").asInstanceOf[Long] == 0
      rounds += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
