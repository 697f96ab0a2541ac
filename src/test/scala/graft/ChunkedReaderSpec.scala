package graft

import graft.sources.ChunkedReader

/** sources/ChunkedReader — the pandas chunksize=/iterator=True
  * surface as deterministic file-group batches.
  */
class ChunkedReaderSpec extends SparkSpec {
  import spark.implicits._

  test("chunks partition the leaf files exactly once, in path order") {
    val path = "/tmp/graft_test/chunked"
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "s")
    df.repartition(7).write.mode("overwrite").parquet(path)
    val chunks = ChunkedReader.byFiles(spark, path, "parquet", 2).toSeq
    assert(chunks.length == 4) // ceil(7/2)
    // exactly-once union
    val union = chunks.reduce(_.unionByName(_))
    assert(union.count() == 100)
    assert(union.select($"k").as[Int].collect().toSet == (1 to 100).toSet)
    // deterministic: a second iteration yields the same file grouping
    val again = ChunkedReader.byFiles(spark, path, "parquet", 2).toSeq
    chunks.zip(again).foreach { case (a, b) =>
      assert(a.inputFiles.toSeq.sorted == b.inputFiles.toSeq.sorted)
    }
    // no overlap between chunks
    val allFiles = chunks.flatMap(_.inputFiles)
    assert(allFiles.distinct.length == allFiles.length)
  }

  test("last chunk may be short; metadata files excluded") {
    val path = "/tmp/graft_test/chunked_short"
    (1 to 10).map(i => (i, i * 2)).toDF("a", "b")
      .repartition(5).write.mode("overwrite").parquet(path)
    val nFiles = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val sizes = ChunkedReader.byFiles(spark, path, "parquet", 3)
      .map(_.inputFiles.length).toSeq
    // grouping math holds whatever the writer emitted; _SUCCESS and
    // .crc files never count
    assert(sizes.sum == nFiles)
    assert(sizes.init.forall(_ == 3) && sizes.last <= 3 && sizes.last > 0)
  }
}
