package graft

import graft.operators.KMeans

/** Lloyd iterations separate direction-clustered synthetic blobs
  * (cosine k-means clusters by direction) and converge to a stable
  * assignment with the deterministic first-K seed.
  */
class KMeansSpec extends SparkSpec {

  test("fit separates three directional blobs") {
    import spark.implicits._
    // 3 blobs of 12 vectors each around orthogonal axes; ids 0..2 are
    // one member of each blob so the first-K seed starts one per blob
    def blob(axis: Int, base: Long): Seq[(Long, Array[Float])] =
      (0 until 12).map { j =>
        val v = Array.fill(4)(0.1f * ((j % 3) + 1))
        v(axis) = 10f + j
        (base + j * 3, v) // interleave ids across blobs
      }
    val e = (blob(0, 0) ++ blob(1, 1) ++ blob(2, 2)).toDF("vec_id", "embedding")

    val cents = KMeans.fit(e, k = 3, iters = 3)
    val cells = KMeans.assign(e, cents)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap

    // all members of a blob share a cell; the three cells are distinct
    val byBlob = (0 until 3).map(b => (0 until 12).map(j => cells(b + j * 3L)).distinct)
    assert(byBlob.forall(_.size == 1), s"blob split across cells: $byBlob")
    assert(byBlob.flatten.distinct.size == 3, s"blobs merged: $byBlob")
  }

  test("a Lloyd step is idempotent once converged") {
    import spark.implicits._
    val e = (1L to 20L).map { i =>
      (i - 1, Array(if (i % 2 == 0) 5f else 0f, if (i % 2 == 0) 0f else 5f, 1f, 1f))
    }.toDF("vec_id", "embedding")
    val c2 = KMeans.fit(e, k = 2, iters = 2)
    val c3 = KMeans.step(e, c2)
    val a2 = KMeans.assign(e, c2).select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val a3 = KMeans.assign(e, c3).select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    assert(a2 == a3)
  }
}
