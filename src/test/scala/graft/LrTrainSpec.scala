package graft

import org.apache.spark.sql.functions._

/** Training-quality gate for txt_lr_train (distributed batch-GD
  * logistic regression). The DuckDB oracle proves the arithmetic is
  * reproduced bit-for-bit; this spec pins what the oracle can't: that
  * the three quantized-gradient iterations actually LEARN — the
  * trained scores must separate the classes better than the untrained
  * w=0 model (which scores every doc 0.5 and predicts nothing).
  */
class LrTrainSpec extends SparkSpec {

  test("trained scores separate en from non-en better than chance") {
    import spark.implicits._
    val out = SparkEntry.queries("txt_lr_train")(spark, sf())
      .select($"score", $"pred", $"y")
    val agg = out.agg(
      avg(when($"y" === 1.0, $"score")).as("mean_pos"),
      avg(when($"y" === 0.0, $"score")).as("mean_neg"),
      avg(when(($"pred" && $"y" === 1.0) || (!$"pred" && $"y" === 0.0), 1.0)
        .otherwise(0.0)).as("acc"),
      avg($"y").as("base")).head()
    val (meanPos, meanNeg) = (agg.getDouble(0), agg.getDouble(1))
    val (acc, base) = (agg.getDouble(2), agg.getDouble(3))
    val majority = math.max(base, 1 - base)
    // deterministic data -> fixed numbers; measured on sf0.001:
    // mean_pos - mean_neg ~ 0.035, acc 0.72 vs majority 0.70
    assert(meanPos > meanNeg,
      s"trained model ranks positives below negatives ($meanPos <= $meanNeg)")
    assert(acc >= majority,
      s"trained accuracy $acc below majority-class baseline $majority")
  }

  test("gradient step moves weights off zero deterministically") {
    import spark.implicits._
    // w=0 scores everything exactly 0.5; training must move scores
    val distinctScores = SparkEntry.queries("txt_lr_train")(spark, sf())
      .select($"score").distinct().count()
    assert(distinctScores > 10,
      s"only $distinctScores distinct scores — weights did not move")
  }
}
