package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Min-label propagation finds the same components as a hand-computed
  * union-find on small graphs, including chains longer than one hop
  * (the case a single propagation round would get wrong).
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def run(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val verts = spark.range(1, n + 1).toDF("id")
    val e = edges.toDF("src", "dst")
    ConnectedComponents.labels(verts, e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain propagates the min label end to end") {
    // 1-2-3-4-5 chain plus isolated 6
    val got = run(6, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(6L) == 6L)
  }

  test("two components and a reversed-direction edge") {
    // edges arrive in arbitrary direction; 7-6 written high-to-low
    val got = run(8, Seq((1L, 3L), (3L, 5L), (7L, 6L), (8L, 6L)))
    assert(got(1L) == 1L && got(3L) == 1L && got(5L) == 1L)
    assert(got(6L) == 6L && got(7L) == 6L && got(8L) == 6L)
    assert(got(2L) == 2L && got(4L) == 4L)
  }

  test("clique converges and keeps every vertex") {
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val got = run(5, clique)
    assert(got.size == 5 && got.values.forall(_ == 1L))
  }

  test("long chain beyond the round cap converges via pointer jumping") {
    // a 200-vertex path has diameter 199 — plain min-label propagation
    // under maxIter=25 silently splits it (the round-3 sf0.1
    // dedup_semantic_clusters bug); pointer jumping needs O(log n)
    // rounds. Worst-case label ordering: chain descending so the min
    // label sits at the far end.
    val n = 200L
    val edges = (1L until n).map(i => (i + 1, i)) // 200-199, ..., 2-1
    val got = run(n, edges)
    assert((1L to n).forall(got(_) == 1L),
      s"chain split into ${got.values.toSet.size} labels")
  }
}
