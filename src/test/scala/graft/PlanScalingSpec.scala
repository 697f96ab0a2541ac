package graft

/** Parallelism-independence lint (VERDICT r8 next-#4): expression tree
  * size must NOT grow with `spark.sql.shuffle.partitions`.
  *
  * The SearchSorted class of bug — a literal when-chain folded over N
  * partition bounds — only manifests at data-sized shuffle settings: at
  * p256 the 255-node tree fell off the whole-stage-codegen fast path
  * and turned an sf100 qcut into 31 minutes. The structural rule is
  * "plan parameters belong in reference objects, not the expression
  * tree" (SCALE.md r8); this spec makes the rule mechanical by building
  * every bench-headline plan at 32 and at 256 shuffle partitions and
  * asserting the total expression node count is unchanged.
  */
class PlanScalingSpec extends SparkSpec {

  private def exprNodeCount(name: String): Int = {
    val plan = SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan
    var n = 0
    plan.foreach { p => p.expressions.foreach { e => e.foreach(_ => n += 1) } }
    n
  }

  test("headline expression trees do not grow with shuffle parallelism") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "32")
      val at32 = Bench.headline.map(n => n -> exprNodeCount(n)).toMap
      spark.conf.set(key, "256")
      val at256 = Bench.headline.map(n => n -> exprNodeCount(n)).toMap
      for (n <- Bench.headline) {
        // a handful of nodes of slack for partition-count literals
        // (e.g. a salt modulus); anything near O(partitions) fails
        assert(at256(n) <= at32(n) + 8,
          s"$n: expression tree grew ${at32(n)} -> ${at256(n)} nodes " +
            "as shuffle partitions went 32 -> 256 — a plan parameter " +
            "is inlined per partition; move it to a reference object " +
            "(see functions/SearchSorted)")
      }
    } finally spark.conf.set(key, saved)
  }
}
