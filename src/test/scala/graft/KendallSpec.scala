package graft

import graft.functions.KendallTau
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.mutable.ArrayBuffer

/** Knight O(n log n) tau-b against the O(n^2) pair-count definition on
  * generator-driven tied data (seeded for reproducibility). */
class KendallSpec extends SparkSpec {

  private def bruteTau(pts: Seq[(Double, Double)]): Double = {
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      val s = (x1 - x2) * (y1 - y2)
      if (s > 0) c += 1
      else if (s < 0) d += 1
      else if (x1 == x2 && y1 != y2) tx += 1
      else if (y1 == y2 && x1 != x2) ty += 1
    }
    (c - d).toDouble / (math.sqrt((c + d + tx).toDouble) * math.sqrt((c + d + ty).toDouble))
  }

  private def knightTau(pts: Seq[(Double, Double)]): Double =
    KendallTau.finish(ArrayBuffer.from(pts))

  private val ptsGen: Gen[List[(Double, Double)]] = for {
    n <- Gen.choose(2, 60)
    pts <- Gen.listOfN(n, Gen.zip(
      Gen.choose(0, 6).map(_.toDouble), Gen.choose(0, 6).map(_.toDouble)))
  } yield pts

  test("knight tau equals brute-force tau on tied integer data") {
    for (i <- 1 to 50) {
      val pts = ptsGen.apply(Gen.Parameters.default, Seed(7000 + i)).getOrElse(Nil)
      if (pts.length >= 2) {
        val b = bruteTau(pts)
        val k = knightTau(pts)
        if (b.isNaN) assert(k.isNaN, s"seed ${7000 + i}: brute NaN, knight $k")
        else assert(math.abs(b - k) < 1e-12, s"seed ${7000 + i}: brute=$b knight=$k")
      }
    }
  }

  test("row-cap guard rejects exact tau above the ceiling, pointing at the scale forms") {
    val small = new graft.functions.KendallTauAgg(maxRows = 10)
    val b = small.zero
    for (i <- 1 to 10) small.reduce(b, (i.toDouble, i.toDouble))
    val e = intercept[IllegalArgumentException] {
      small.reduce(b, (11.0, 11.0))
    }
    assert(e.getMessage.contains("grouped"))
    assert(e.getMessage.contains("sampled"))
    val e2 = intercept[IllegalArgumentException] {
      small.merge(b, ArrayBuffer((1.0, 1.0)))
    }
    assert(e2.getMessage.contains("grouped"))
    // the default instance's ceiling matches the documented constant
    assert(graft.functions.KendallTau.MaxExactRows == 200L * 1000 * 1000)
  }

  test("grouped tau matches brute-force tau per group") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 1.0), ("a", 3.0, 4.0), ("a", 4.0, 3.0),
      ("b", 1.0, 1.0), ("b", 2.0, 2.0), ("b", 3.0, 3.0)
    ).toDF("g", "x", "y")
    val got = graft.functions.KendallTau
      .grouped(spark, df, "g", $"x", $"y")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wantA = bruteTau(Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0)))
    assert(math.abs(got("a") - wantA) < 1e-12)
    assert(math.abs(got("b") - 1.0) < 1e-12)
  }

  test("knight tau on perfectly concordant and discordant series") {
    val up = (1 to 50).map(i => (i.toDouble, i.toDouble))
    assert(math.abs(knightTau(up) - 1.0) < 1e-12)
    val down = (1 to 50).map(i => (i.toDouble, -i.toDouble))
    assert(math.abs(knightTau(down) + 1.0) < 1e-12)
  }
}
