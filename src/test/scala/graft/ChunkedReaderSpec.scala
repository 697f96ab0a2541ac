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

  test("chunk subquery quotes the key per the URL's JDBC dialect") {
    // round-12 ADVICE: a hardcoded ANSI '"' parses as a string LITERAL
    // on MySQL (backticks, ANSI_QUOTES off) — the chunk predicate
    // would silently compare a constant against the bounds. The
    // subquery must take its identifier quote from the dialect.
    val my = ChunkedReader.chunkSubquery(
      "jdbc:mysql://h/db", "t", "k", 0L, 10L, 1)
    assert(my.contains("`k` >= 0") && my.contains("`k` < 10"), my)
    val ansi = ChunkedReader.chunkSubquery(
      "jdbc:derby:/x/db", "t", "k", 0L, 10L, 1)
    assert(ansi.contains("\"k\" >= 0") && ansi.contains("\"k\" < 10"), ansi)
    // NULL keys ride chunk 0 only, quoted the same way
    val first = ChunkedReader.chunkSubquery(
      "jdbc:mysql://h/db", "t", "k", 0L, 10L, 0)
    assert(first.contains("OR `k` IS NULL"), first)
    assert(!my.contains("IS NULL"), my)
  }

  test("JDBC key-range chunks tile [lower, upper) exactly once, nulls in chunk 0") {
    // read_sql(chunksize=) parity (pandas io/sql.py:543) over the same
    // embedded Derby the src_jdbc_roundtrip oracle row uses
    System.setProperty("derby.system.home", "/tmp/graft_test/derby_home")
    val url = "jdbc:derby:/tmp/graft_test/derby_chunk/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val df = ((1 to 97).map(i => (Option(i.toLong), s"v$i")) :+
      ((None: Option[Long], "null_key"))).toDF("k", "s")
    df.write.mode("overwrite").jdbc(url, "chunk_t", props)
    val chunks = ChunkedReader.byJdbcRange(spark, url, "chunk_t", props,
      "k", lowerBound = 1L, upperBound = 98L, keysPerChunk = 25L,
      partitionsPerChunk = 2).toSeq
    assert(chunks.length == 4) // ceil(97/25)
    // exactly-once: union equals the table, including the null key
    val union = chunks.reduce(_.unionByName(_))
    assert(union.count() == 98)
    assert(union.select($"s").as[String].collect().toSet ==
      df.select($"s").as[String].collect().toSet)
    // no overlap: each key appears in exactly one chunk
    val perChunk = chunks.map(_.select($"k").collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet)
    assert(perChunk.map(_.size).sum == 98)
    // the null key rides the first chunk
    assert(perChunk.head.contains(-1L) && perChunk.tail.forall(!_.contains(-1L)))
    // bounded: chunk 1 holds exactly keys [1,26) plus the null
    assert(perChunk.head - (-1L) == (1L until 26L).toSet)
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
