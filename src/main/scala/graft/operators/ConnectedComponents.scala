package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation.
  *
  * Used as the final step of near-duplicate deduplication: LSH emits
  * verified pair edges, components give each document a canonical
  * cluster representative (the minimum doc id reachable from it).
  *
  * Algorithm: every vertex starts labeled with itself; each round
  * does (a) a neighbor step — a vertex takes the min of its own label
  * and its neighbors' labels — and (b) a pointer-jumping step — the
  * vertex then adopts its label's label (path compression, the
  * Shiloach-Vishkin shortcut). The neighbor step alone converges in
  * `diameter(G)` rounds, which a long-chain component can push past
  * any fixed cap (round-3 finding: the sf0.1 semantic graph has a
  * 519-vertex component with diameter > 25, which silently split);
  * with pointer jumping label depth halves every round, so
  * convergence is O(log n) rounds on ANY graph — 25 is then a wide
  * margin, not a correctness bet. Each round is three keyed shuffles
  * (edge-label join + min-aggregate + label-parent join); there is no
  * driver-side graph state, only a per-round `count` action for the
  * convergence test.
  *
  * Scale notes (100 TB corpus, ~10^9 vertices):
  *  - per-round state is one (id, label) row per vertex — O(V) rows of
  *    16 bytes, never collected;
  *  - `localCheckpoint` truncates the lineage each round; without it
  *    the iterated join plan grows exponentially and Catalyst analysis
  *    dominates. On a real cluster use `spark.sparkContext
  *    .setCheckpointDir` + `checkpoint()` for fault-tolerant
  *    truncation instead;
  *  - the same round shape is the building block of large-star/
  *    small-star (Kiveris et al., "Connected Components in MapReduce
  *    and Beyond", SoCC'14), which additionally rewires edges; the
  *    label-side pointer jumping here already gives the O(log n)
  *    round bound that matters for correctness.
  */
object ConnectedComponents {

  /** @param vertices one column `id`
    * @param edges    columns `src`, `dst`; undirected (one direction
    *                 per pair is enough — both are generated here)
    * @return (id, label) with label = min vertex id of the component
    */
  /** Materialize `df` and truncate BOTH lineage and plan statistics
    * (round-14). `Dataset.localCheckpoint` alone carries the origin
    * plan's Statistics into the LogicalRDD (Spark 3.4+ originStats),
    * and this loop's per-round label self-join SQUARES the
    * sizeInBytes estimate — after ~20 rounds the estimate is a
    * multi-million-digit BigInteger and every round's PLANNING drowns
    * in BigInteger.multiply on the driver (measured: round 22 of the
    * sf0.1 semantic graph cost 95 s, all driver CPU, 2000 rows).
    * Rebuilding the frame from the checkpointed RDD resets stats to
    * the session default; the Row round-trip is O(rows) per round —
    * the same order as the joins that consume it. */
  private def materialized(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    rdd.count()
    df.sparkSession.createDataFrame(rdd, df.schema)
  }

  def labels(vertices: DataFrame, edges: DataFrame, maxIter: Int = 40): DataFrame = {
    // round-14: the edge list is MATERIALIZED once before the loop.
    // Every round's neighbor join consumes `und`, and without the
    // checkpoint each round re-evaluated the whole edge-producing
    // pipeline (for the semantic dedup that is the LSH multitable
    // candidate join + exact cosine verify — measured 395 s at sf0.1,
    // ~23 s with the edges materialized). O(E) rows of two longs —
    // the same storage the per-round label checkpoint already accepts.
    val und = materialized(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))))

    var cur = materialized(vertices.select(col("id"), col("id").as("label")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // (a) min label among each vertex's neighbors; the pre-step label
      // rides along so the convergence test below is a free filter
      // instead of another O(V) join
      val nbrMin = und.join(cur, und("src") === cur("id"))
        .groupBy(und("dst").as("nid")).agg(min("label").as("nl"))
      val stepped = cur.join(nbrMin, cur("id") === col("nid"), "left")
        .select(cur("id"), cur("label").as("old"),
          least(cur("label"), coalesce(col("nl"), cur("label"))).as("label"))
      // (b) pointer jumping: adopt the label's own label (labels only
      // decrease and every label is a vertex id, so the lookup always
      // resolves; left join keeps isolated vertices)
      val par = stepped.select(col("id").as("pid"), col("label").as("plabel"))
      val next = materialized(
        stepped.join(par, stepped("label") === col("pid"), "left")
          .select(stepped("id"), stepped("old"),
            coalesce(col("plabel"), stepped("label")).as("label")))
      changed = next.filter(col("label") < col("old")).count()
      cur = next.select(col("id"), col("label"))
      it += 1
    }
    // non-convergence must be LOUD: returning here with changed > 0 is
    // exactly the silent component-split this operator's round-3 bug
    // was — under-merged duplicates that nothing downstream can detect
    require(changed == 0,
      s"ConnectedComponents: not converged after $maxIter rounds " +
      "(components would be silently split); raise maxIter — pointer " +
      "jumping needs only ~log2(diameter) rounds")
    cur
  }
}
