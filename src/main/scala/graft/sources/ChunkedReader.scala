package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** read_csv(chunksize=) / iterator=True (pandas io/parsers/readers.py
  * TextFileReader) — the sequential-batch surface.
  *
  * pandas chunks by ROW COUNT because a single process must bound its
  * memory; a Spark scan is already partitioned and bounded per task,
  * so the surviving use case is the DRIVER-side sequential loop: feed
  * a huge table batch-by-batch into something external (a model
  * trainer, a rate-limited service, a single-writer sink) where each
  * batch must be a complete DataFrame and batches must not overlap.
  *
  * The honest distributed unit is the FILE, not the row: chunking by
  * file groups needs no global row order, no counting pass, and each
  * chunk is a plain pruned scan over its own files (predicate
  * pushdown, column pruning and parallelism all intact within the
  * chunk). Row-exact chunks would cost a global ordinal (one full
  * shuffle) plus one filtered pass per chunk — if row-exactness is
  * really required, `GlobalOrder.zipOrdinal` + range filters gives it,
  * but no known batch consumer needs exact counts over exact bytes.
  *
  * Chunks are deterministic (files sorted by path) and exactly-once:
  * every leaf file lands in exactly one chunk — `src_chunked_csv`
  * pins that by re-aggregating the union of all chunks against the
  * unchunked oracle.
  */
object ChunkedReader {

  /** Leaf data files under `path`, sorted by path for determinism;
    * hidden/metadata files (`_SUCCESS`, dotfiles, .crc) excluded. */
  private def leafFiles(s: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".") &&
          f.getLen > 0)
        out += f.getPath.toString
    }
    out.sorted.toSeq
  }

  /** Iterator of DataFrames, `filesPerChunk` leaf files each (the
    * last chunk may be smaller). Lazy: chunk N's scan is planned when
    * the iterator reaches it. */
  def byFiles(s: SparkSession, path: String, format: String,
      filesPerChunk: Int, schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): Iterator[DataFrame] = {
    require(filesPerChunk > 0, "filesPerChunk must be positive")
    leafFiles(s, path).grouped(filesPerChunk).map { group =>
      val rd = s.read.format(format).options(options)
      schema.fold(rd)(rd.schema).load(group: _*)
    }
  }

  /** read_sql(chunksize=) (pandas io/sql.py:543) — sequential
    * DataFrame batches over a JDBC table. The honest distributed unit
    * here is the KEY RANGE of the numeric partition column (the same
    * unit Spark's own partitioned JDBC read strides by), mirroring
    * [[byFiles]]' file-not-row rule: row-exact chunks would need a
    * server-side ordinal per chunk, but a batch consumer needs
    * bounded, non-overlapping, exactly-once batches — which key
    * ranges give for free.
    *
    * Coverage contract: chunks tile `[lowerBound, upperBound)`
    * exactly once (last chunk may be narrower); NULL keys ride the
    * FIRST chunk (the same place Spark's clamped first partition puts
    * them). Each chunk is itself a partitioned scan
    * (`partitionsPerChunk` sub-ranges), so the driver-side sequential
    * loop still reads each batch in parallel — the range predicate is
    * part of the pushed-down dbtable subquery, so the database never
    * ships out-of-chunk rows. */
  def byJdbcRange(s: SparkSession, url: String, table: String,
      props: java.util.Properties, partitionColumn: String,
      lowerBound: Long, upperBound: Long, keysPerChunk: Long,
      partitionsPerChunk: Int = 4): Iterator[DataFrame] = {
    require(upperBound > lowerBound, "empty key range")
    require(keysPerChunk > 0, "keysPerChunk must be positive")
    require(partitionColumn.matches("[A-Za-z0-9_]+"),
      s"partitionColumn '$partitionColumn' is not a plain identifier")
    val bounds = Iterator.iterate(lowerBound)(_ + keysPerChunk)
      .takeWhile(_ < upperBound)
      .map(lo => (lo, math.min(lo + keysPerChunk, upperBound)))
    // quoted VIA THE URL'S DIALECT: Spark's JDBC writer creates
    // case-sensitive quoted identifiers, so the raw name would
    // upper-case on ANSI databases — but the quote character is
    // dialect-specific (MySQL backticks, SQL Server brackets); a
    // hardcoded ANSI '"' would parse as a string literal there and the
    // chunk predicate would silently compare against a constant
    // (round-12 ADVICE)
    bounds.zipWithIndex.map { case ((lo, hi), i) =>
      val sub = chunkSubquery(url, table, partitionColumn, lo, hi, i)
      s.read
        .option("partitionColumn", partitionColumn)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", partitionsPerChunk.toString)
        .jdbc(url, sub, props)
    }
  }

  /** The pushed-down chunk subquery. Identifier quoting comes from the
    * URL'S JDBC DIALECT, not a hardcoded ANSI '"': on MySQL (backticks,
    * ANSI_QUOTES off) a double-quoted name parses as a string LITERAL,
    * so the chunk predicate would silently compare a constant to the
    * bounds and every chunk would return the whole table or nothing
    * (round-12 ADVICE). Exposed for spec coverage per dialect. */
  private[graft] def chunkSubquery(url: String, table: String,
      partitionColumn: String, lo: Long, hi: Long, i: Int): String = {
    val qc = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      .quoteIdentifier(partitionColumn)
    // NULL keys ride the FIRST chunk (coverage contract above)
    val nullPred = if (i == 0) s" OR $qc IS NULL" else ""
    s"(SELECT * FROM $table WHERE ($qc >= $lo AND $qc < $hi$nullPred)) AS graft_chunk_$i"
  }
}
