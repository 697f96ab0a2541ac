package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-6 curation additions: temperature-weighted
  * domain mixing and keep-best weak-key dedup.
  */
class MixKeepBestSpec extends SparkSpec {

  test("pipe_domain_mix lands near the budget at the tempered mixture") {
    val out = SparkEntry.queries("pipe_domain_mix")(spark, sf()).cache()
    try {
      val total = out.count()
      // expected output ≈ MixBudget (200) docs; Bernoulli variance at
      // n=200 keeps the realized count well inside ±35%
      assert(total > 130 && total < 270, s"total=$total not near budget 200")

      // temperature flattening: the head domain's SHARE of the sample
      // must be strictly below its share of the corpus (alpha=0.5
      // pulls every domain toward sqrt weight)
      val corpus = Tables(spark, sf(), "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sample = out.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val corpusTotal = corpus.values.sum.toDouble
      val head = corpus.maxBy(_._2)._1
      val corpusShare = corpus(head) / corpusTotal
      val sampleShare = sample.getOrElse(head, 0L) / total.toDouble
      assert(sampleShare < corpusShare,
        s"head domain $head not flattened: sample $sampleShare vs corpus $corpusShare")
      // every domain survives the tempering (no starved tail)
      assert(corpus.keySet.forall(l => sample.getOrElse(l, 0L) > 0L),
        s"starved domains: ${corpus.keySet -- sample.keySet}")
    } finally out.unpersist()
  }

  test("dedup_keep_best keeps the longest copy per weak key") {
    val out = SparkEntry.queries("dedup_keep_best")(spark, sf())
    val docs = Tables(spark, sf(), "documents")
      .withColumn("prefix_key", array_join(slice(split(col("text"), " "), 1, 3), " "))
    // (a) one survivor per key, (b) group sizes add back to the corpus
    val total = docs.count()
    val agg = out.agg(count(lit(1)), sum(col("n_docs"))).head()
    assert(agg.getLong(0) == docs.select("prefix_key").distinct().count())
    assert(agg.getLong(1) == total)
    // (c) the kept doc carries the group max n_chars
    val bad = out.join(docs, Seq("prefix_key"))
      .groupBy(col("prefix_key"), col("keep_chars"))
      .agg(max(col("n_chars")).as("true_max"))
      .filter(col("keep_chars") =!= col("true_max"))
      .count()
    assert(bad == 0L, s"$bad keys kept a non-maximal copy")
  }
}
