package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components with min-id labels — the clustering stage a
  * production dedup pipeline runs AFTER near-dup pair generation (pairs say "a ~ b";
  * the pipeline needs "keep one doc per transitive group").
  *
  * Algorithm: min-label propagation with pointer jumping. Every node starts
  * labeled with itself; each round takes the min of its own and its neighbors'
  * labels, then compresses one pointer hop (label := label's label). Labels only
  * decrease, never leave the component, and at the fixpoint every adjacent pair
  * has equal labels — so the label IS the component's min id, exactly and
  * deterministically (no dependence on partitioning or visit order; the DuckDB
  * oracle reproduces it with a recursive-CTE reachability min).
  *
  * Scale: each round is two keyed equi-joins + one keyed min aggregation — no
  * cartesian anywhere, shuffle keys are node ids (near-uniform for hashed doc
  * ids). Plain propagation alone needs O(component diameter) rounds; the pointer
  * jump compresses chains so label trees halve each round (O(log diameter) —
  * near-dup clusters are shallow in practice, but a 100 TB corpus can chain, and
  * log-rounds is what makes the driver loop safe there). Each round
  * localCheckpoints a frame of one row per node-in-any-pair — orders of magnitude
  * smaller than the corpus; the loop is driver-BOUNDED (like hotPathIterative's
  * depth loop), not driver-SIZED: no per-row data ever reaches the driver except
  * the one `changed` count per round.
  */
object Components {

  /** (id, cluster) for every node in `edges`, cluster = min node id reachable.
    * `edges` columns: id_a, id_b (one row per undirected edge, either order).
    */
  def minLabelComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      .localCheckpoint() // the edge frame is reused every round; pin it once
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = sym.join(labels.select(col("id").as("v"), col("lbl").as("vl")), "v")
        .groupBy(col("u").as("id")).agg(min("vl").as("nl"))
      // carry the pre-round label through as __old so the convergence check is a
      // filter on the checkpointed frame, not another join+shuffle per round
      val prop = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("__old"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
      // pointer jump: label := label's current label (labels are node ids, so the
      // lookup is a self-join); compresses label chains for log-round convergence
      val mm = prop.select(col("id").as("__mid"), col("lbl").as("__mlbl"))
      val next = prop.join(mm, prop("lbl") === mm("__mid"))
        .select(prop("id").as("id"), col("__mlbl").as("lbl"),
          (col("__mlbl") =!= col("__old")).as("__chg"))
        .localCheckpoint() // cut the per-round plan growth; also the changed-count input
      changed = next.filter(col("__chg")).count()
      labels = next.drop("__chg")
      rounds += 1
    }
    require(changed == 0, s"components did not converge in $maxRounds rounds")
    labels
  }
}
