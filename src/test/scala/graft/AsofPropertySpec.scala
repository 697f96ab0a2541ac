package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check (SURVEY §5 test plan item d): the distributed
  * as-of join agrees with a brute-force in-memory reference on random
  * inputs — keys, timestamps, and match gaps are generator-driven,
  * seeded for reproducibility.
  */
class AsofPropertySpec extends SparkSpec {

  private val rowsGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 40L)
      v <- Gen.choose(1, 999)
    } yield (k, t, v.toDouble))
  } yield rows.distinctBy(r => (r._1, r._2)) // unique (key, ts)

  private def sample(seed: Long): List[(Long, Long, Double)] =
    rowsGen.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("backward as-of matches brute force on random data") {
    import spark.implicits._
    for (i <- 1 to 10) {
      val lRows = sample(1000 + i)
      val rRows = sample(2000 + i)
      if (lRows.nonEmpty) {
        val left = lRows.toDF("k", "tsm", "lv")
          .withColumn("t", timestamp_micros($"tsm" * 1000000L)).drop("tsm")
        val right = rRows.toDF("k", "tsm", "v")
          .withColumn("t", timestamp_micros($"tsm" * 1000000L)).drop("tsm")

        val got = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
          .select($"k", (unix_micros($"t") / 1000000L).cast("long"), $"v")
          .as[(Long, Long, Option[Double])].collect()
          .map(r => (r._1, r._2) -> r._3).toMap

        val want = lRows.map { case (k, t, _) =>
          val cand = rRows.filter(r => r._1 == k && r._2 <= t)
          (k, t) -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
        }.toMap

        assert(got == want, s"iteration $i: $lRows vs $rRows")
      }
    }
  }
}
