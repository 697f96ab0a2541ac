package graft

import org.apache.spark.sql.functions._
import graft.pipeline.PackQueries

/** Invariants of the chunking + packing shaping ops that the
  * row-hash oracle can't express directly: tail coverage, overlap
  * stride, budget-boundary assignment, token conservation.
  */
class PackSpec extends SparkSpec {

  test("chunks cover every document and respect size/stride") {
    val chunks = PackQueries.queries("pipe_chunk_overlap")(spark, sf())
      .select("doc_id", "chunk_id", "tok_start", "n_chunk_toks")
      .collect()
      .groupBy(_.getLong(0))
    val docs = Tables(spark, sf(), "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == docs.keySet, "every doc must chunk")
    for ((id, rows) <- chunks) {
      val n = docs(id)
      val sorted = rows.sortBy(_.getInt(1))
      // chunk ids are 0..k-1, starts advance by the stride
      assert(sorted.map(_.getInt(1)).toSeq == sorted.indices)
      for ((r, i) <- sorted.zipWithIndex)
        assert(r.getInt(2) == i * PackQueries.Stride + 1, s"doc $id chunk $i start")
      // every chunk is at most the window; the last chunk reaches the
      // document tail exactly
      assert(sorted.forall(_.getInt(3) <= PackQueries.ChunkSize))
      val last = sorted.last
      assert(last.getInt(2) + last.getInt(3) - 1 == n,
        s"doc $id tail not covered")
      // all but the last are full windows unless the doc is short
      sorted.dropRight(1).foreach(r => assert(r.getInt(3) == PackQueries.ChunkSize))
    }
  }

  test("packing conserves tokens and respects the budget boundary rule") {
    val d = sf()
    val bins = PackQueries.queries("pipe_pack_sequences")(spark, d).collect()
    val docs = Tables(spark, d, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // token conservation per source
    val wantTok = docs.groupBy(_._1).view.mapValues(_.map(_._3.toLong).sum)
    val gotTok = bins.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(3)).sum)
    assert(gotTok.toMap == wantTok.toMap)
    // recompute the assignment rule and compare bin stats
    for ((src, ds) <- docs.groupBy(_._1)) {
      var cum = 0L
      val assign = ds.sortBy(_._2).map { case (_, id, n) =>
        val bin = cum / PackQueries.Budget; cum += n; (bin, id, n.toLong)
      }
      val want = assign.groupBy(_._1).map { case (b, xs) =>
        (b, xs.length.toLong, xs.map(_._3).sum, xs.map(_._2).min, xs.map(_._2).max)
      }.toSet
      val got = bins.filter(_.getString(0) == src)
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got == want, s"source $src bin stats")
    }
  }
}
