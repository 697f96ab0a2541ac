package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation.
  *
  * Used as the final step of near-duplicate deduplication: LSH emits
  * verified pair edges, components give each document a canonical
  * cluster representative (the minimum doc id reachable from it).
  *
  * Algorithm: every vertex starts labeled with itself; each round a
  * vertex takes the min of its own label and its neighbors' labels.
  * Converges in `diameter(G)` rounds — near-dup components are
  * quasi-cliques (every member pairs with most others), so the
  * diameter is tiny and 3-5 rounds suffice in practice. Each round is
  * two shuffles (edge-label join + min-aggregate), both keyed on
  * vertex id, so AQE coalesces them; there is no driver-side graph
  * state, only a per-round `count` action for the convergence test.
  *
  * Scale notes (100 TB corpus, ~10^9 vertices):
  *  - per-round state is one (id, label) row per vertex — O(V) rows of
  *    16 bytes, never collected;
  *  - `localCheckpoint` truncates the lineage each round; without it
  *    the iterated join plan grows exponentially and Catalyst analysis
  *    dominates. On a real cluster use `spark.sparkContext
  *    .setCheckpointDir` + `checkpoint()` for fault-tolerant
  *    truncation instead;
  *  - for adversarial long-chain graphs the O(diameter) bound is the
  *    limit; the fix is the large-star/small-star algorithm
  *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *    SoCC'14), which converges in O(log^2 n) rounds with the same
  *    join-shape per round. Dedup graphs never need it.
  */
object ConnectedComponents {

  /** @param vertices one column `id`
    * @param edges    columns `src`, `dst`; undirected (one direction
    *                 per pair is enough — both are generated here)
    * @return (id, label) with label = min vertex id of the component
    */
  def labels(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))

    var cur = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // min label among each vertex's neighbors
      val nbrMin = und.join(cur, und("src") === cur("id"))
        .groupBy(und("dst").as("nid")).agg(min("label").as("nl"))
      val next = cur.join(nbrMin, cur("id") === col("nid"), "left")
        .select(cur("id"),
          least(cur("label"), coalesce(col("nl"), cur("label"))).as("label"),
          (col("nl") < cur("label")).as("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
      cur = next.select(col("id"), col("label"))
      it += 1
    }
    cur
  }
}
