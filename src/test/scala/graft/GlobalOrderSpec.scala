package graft

import org.apache.spark.sql.functions._
import graft.operators.GlobalOrder

/** The columnar zipOrdinal must assign exactly row_number()-1 ordinals
  * (contiguous, following sort order) WITHOUT a single-partition
  * window and WITHOUT leaving the DataFrame algebra. The dangerous
  * failure mode is the counts branch seeing a different partition
  * layout than the data branch (range-bound sampling is seeded per
  * execution), which would silently misalign the offsets — these
  * tests pin ordinal contiguity + order agreement on data big enough
  * to span every shuffle partition, twice (nested calls), plus ties.
  */
class GlobalOrderSpec extends SparkSpec {

  test("zipOrdinal assigns contiguous ordinals in sort order") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ((i * 2654435761L) % 99991, s"r$i"))
      .toDF("k", "tag")
    val z = GlobalOrder.zipOrdinal(df, Seq(col("k")), "ord")
    val byOrd = z.orderBy("ord").select($"k", $"ord").as[(Long, Long)].collect()
    assert(byOrd.length == 10000)
    assert(byOrd.map(_._2).sameElements(0L until 10000L))      // contiguous
    assert(byOrd.map(_._1).sameElements(byOrd.map(_._1).sorted)) // sort order
  }

  test("zipOrdinal gives ties a contiguous ordinal run") {
    import spark.implicits._
    // 200 distinct values x 50 dups: every value's ordinals must form
    // exactly the run [rank_of_first, rank_of_first + 50)
    val df = (0 until 10000).map(i => (i % 200, i)).toDF("k", "i")
    val z = GlobalOrder.zipOrdinal(df, Seq(col("k")), "ord")
    val runs = z.groupBy("k")
      .agg(min("ord").as("lo"), max("ord").as("hi"), count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    runs.zipWithIndex.foreach { case ((k, lo, hi, n), idx) =>
      assert(n == 50 && lo == idx * 50L && hi == lo + 49, s"k=$k")
    }
  }

  test("nested zipOrdinal calls stay consistent (spearman shape)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ((i * 48271L) % 2311, (i * 16807L) % 1009))
      .toDF("x", "y")
    val z1 = GlobalOrder.zipOrdinal(df, Seq(col("x")), "ox")
    val z2 = GlobalOrder.zipOrdinal(z1, Seq(col("y")), "oy")
    val rows = z2.select($"x", $"y", $"ox", $"oy")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 5000)
    val byOx = rows.sortBy(_._3)
    assert(byOx.map(_._3).sameElements(0L until 5000L))
    assert(byOx.map(_._1).sameElements(byOx.map(_._1).sorted))
    val byOy = rows.sortBy(_._4)
    assert(byOy.map(_._4).sameElements(0L until 5000L))
    assert(byOy.map(_._2).sameElements(byOy.map(_._2).sorted))
  }
}
