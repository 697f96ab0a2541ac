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
}
