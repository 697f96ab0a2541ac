package graft

import org.apache.spark.sql.functions._

/** Recall@1 quality gate for the ANN families.
  *
  * The DuckDB oracle proves each ANN query computes ITS OWN candidate
  * structure correctly, but not that the structure finds true
  * neighbors — round 2's correlated-hyperplane bug (every LSH table a
  * phase shift of one 7-cycle, recall collapsed) passed every oracle.
  * This spec pins recall@1 against an INDEPENDENT ground truth: plain
  * driver-side Scala over the 500-vector table (tiny by construction;
  * the production-scale truth is the brute-force baseline queries).
  *
  * Data + algorithms are deterministic, so the recalls are fixed
  * numbers; the floors sit just below the measured values and exist to
  * catch structural regressions (a parameter change that legitimately
  * trades recall should update them consciously).
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val vecs: Array[(Long, Array[Double])] = {
    val s = spark
    import s.implicits._
    spark.read.parquet(sf() + "/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }
      .sortBy(_._1)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  private def truth(metric: (Array[Double], Array[Double]) => Double,
      best: (Double, Double) => Boolean): Map[Long, Long] =
    vecs.iterator.filter(_._1 < 50).map { case (q, qv) =>
      q -> vecs.iterator.filter(_._1 != q)
        .map { case (c, cv) => (c, metric(qv, cv)) }
        .reduceLeft((x, y) => if (best(y._2, x._2)) y else x)._1
    }.toMap

  private lazy val cosTruth = truth(cosine, _ > _)
  private lazy val l2Truth = truth(l2sq, _ < _)

  private def recall(name: String, t: Map[Long, Long]): Double = {
    val picks = SparkEntry.queries(name)(spark, sf())
      .select(col("vq"), col("vc")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    t.count { case (q, n) => picks.get(q).contains(n) }.toDouble / t.size
  }

  test("ANN families find true nearest neighbors") {
    // measured at sf0.001 (500 vecs, 50 queries): 0.02 / 0.20 / 0.52 /
    // 0.70 / 0.06 / 0.54 / 0.50 — the recall ladder the family
    // documents: single-table LSH is the labeled low-recall baseline,
    // OR-amplification widens it, IVF beats LSH on clustered data,
    // training the quantizer adds ~0.2, per-subspace-trained PQ with
    // exact re-rank (sim_pq_trained) recovers IVF-class recall from
    // 16-byte codes (trained codebooks alone gave 0.08 — the ADC
    // shortlist + refine step is what closes the gap), and IVF-PQ
    // holds most of trained-IVF recall with the same code budget.
    val floors = Seq(
      ("sim_lsh_ann", cosTruth, 0.0),
      ("sim_lsh_multitable", cosTruth, 0.15),
      ("sim_ivf_ann", cosTruth, 0.45),
      ("sim_ivf_trained", cosTruth, 0.60),
      ("sim_pq_ann", l2Truth, 0.04),
      ("sim_pq_trained", l2Truth, 0.45),
      ("sim_ivfpq_ann", l2Truth, 0.40))
    val measured = floors.map { case (n, t, f) => (n, recall(n, t), f) }
    info(measured.map { case (n, r, _) => f"$n=$r%.2f" }.mkString(" "))
    for ((n, r, f) <- measured)
      assert(r >= f, f"$n recall@1 $r%.2f below floor $f%.2f")
  }
}
