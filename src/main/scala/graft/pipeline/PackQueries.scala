package graft.pipeline

import graft.{QueryModule, Tables}
import graft.functions.PortableHash.{P, wordHash, wordHashSql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunking + sequence packing — the two shaping steps between a
  * curated corpus and a training run.
  *
  *   - `pipe_chunk_overlap`: split each document into fixed-size
  *     overlapping token windows (size 64, stride 48) — the standard
  *     context-window chunking for embedding/pretraining pipelines
  *     (reference analogue: a str.split + rolling slice composition;
  *     there is no single pandas op, which is why this lives in the
  *     pipeline family). Pure map-side `explode` over per-row
  *     `sequence()` — chunk boundaries depend only on the row, so at
  *     100 TB this runs inside the scan stage with ZERO shuffles and
  *     fans out rows without ever materializing the word arrays
  *     off-heap.
  *   - `pipe_pack_sequences`: contiguous greedy packing of documents
  *     into fixed token budgets (256 tokens) — concat-then-split
  *     assignment: a document belongs to the bin where its starting
  *     token offset lands. One shuffle (hash by source), an
  *     in-partition running sum, then a partial-aggregated groupBy.
  *     Contiguity is inherently sequential PER SOURCE; the at-scale
  *     variant shards each source into independently-packed segments
  *     (partition by (source, shard)) accepting ~1 ragged bin per
  *     shard boundary — same plan shape, bounded skew. Documented
  *     here, semantics pinned by the per-source form.
  */
object PackQueries extends QueryModule {

  private[graft] val ChunkSize = 64
  private[graft] val Stride    = 48
  private[graft] val Budget    = 256

  /** BPE-token budget for the tokenize->pack composite (BPE counts run
    * ~3-4x the whitespace word counts at K=12 merges) */
  private[graft] val BpeBudget = 1024

  private def words: Column = split(col("text"), " ")

  def queries: Map[String, Q] = Map(
    // sliding-window chunking with overlap: last chunk always covers
    // the document tail; short docs yield exactly one chunk
    "pipe_chunk_overlap" -> { (s, d) =>
      import s.implicits._
      // materialize the split once: after the explode fan-out every chunk
      // row would otherwise re-split the full document text
      val n = size($"ws")
      val extra = greatest(n - lit(ChunkSize), lit(0))
      val nchunks = floor((extra + lit(Stride - 1)) / lit(Stride)).cast("int") + 1
      val start = $"k" * Stride + 1
      val chunk = slice($"ws", start, lit(ChunkSize))
      Tables(s, d, "documents")
        .withColumn("ws", words)
        .withColumn("k", explode(sequence(lit(0), nchunks - 1)))
        .select($"doc_id", $"source", $"k".as("chunk_id"),
          start.as("tok_start"),
          size(chunk).as("n_chunk_toks"),
          array_join(chunk, " ").as("chunk_text"))
    },

    // the AT-SCALE packing shape: each source is sharded into
    // independently-packed segments (partition by (source, shard)),
    // accepting ~1 ragged bin per shard boundary. Contiguity is
    // sequential only WITHIN a shard, so parallelism scales with
    // sources x shards instead of sources — the variant the per-source
    // form's scaladoc promises
    "pipe_pack_shards" -> { (s, d) =>
      import s.implicits._
      val shards = 4
      val w = Window.partitionBy($"source", $"shard").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "documents")
        .withColumn("shard", pmod($"doc_id", lit(shards)))
        .withColumn("n_tok", size(words))
        .withColumn("cum", sum($"n_tok").over(w))
        .withColumn("bin", floor(($"cum" - $"n_tok") / lit(Budget)))
        .groupBy($"source", $"shard", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
    },

    // contiguous token-budget packing per source, ordered by doc_id:
    // bin = floor(starting-token-offset / budget)
    "pipe_pack_sequences" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "documents")
        .withColumn("n_tok", size(words))
        .withColumn("cum", sum($"n_tok").over(w))
        .withColumn("bin", floor(($"cum" - $"n_tok") / lit(Budget)))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
    },

    // the tokenize->pack capstone: count each document in TRAINED BPE
    // tokens (txt_bpe_train's merge table, applied map-side — the K
    // merges ride along as string literals, so the encode adds zero
    // shuffles to the scan stage), then pack into contiguous
    // 1024-BPE-token bins per source. This is the post-curation half
    // of a training-data pipeline — real token budgets, not the
    // whitespace proxy pipe_pack_sequences uses — and at 100 TB it
    // costs the BPE training (vocabulary-sized, K driver rows) plus
    // ONE per-source shuffle for the running sum, identical to the
    // plain pack.
    "pipe_tokenize_pack" -> { (s, d) =>
      import s.implicits._
      val merges = BpeQueries.train(s, d)
      val w = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "documents")
        .withColumn("n_tok", BpeQueries.bpeTokenCountOf(merges))
        .withColumn("cum", sum($"n_tok").over(w))
        .withColumn("bin", floor(($"cum" - $"n_tok") / lit(BpeBudget)))
        .groupBy($"source", $"bin")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").as("n_bpe_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
    },

    // deterministic corpus shuffle + train/val/test split — the last
    // step before a training run. Both are pure functions of the doc
    // id through the portable hash (domain-separated "split:"/
    // "shuffle:" keys, so membership and order are independent), which
    // makes the split STABLE under corpus growth — a doc never changes
    // split when new data arrives — and the shuffle reproducible
    // across runs, the two properties a random() split lacks.
    //
    // The within-split position is a global ordinal over
    // (split, shuffle_key): GlobalOrder range-partitions on a fused
    // numeric sort key (split_id stacked above the hash), so there is
    // NO row_number window partitioned by the 3-value split column —
    // that plan would funnel 80% of a 100 TB corpus through one task.
    // Per-split offsets come back as a 3-row broadcast.
    "pipe_shuffle_split" -> { (s, d) =>
      import s.implicits._
      val idStr = $"doc_id".cast("string")
      val bucket = wordHash(concat(lit("split:"), idStr)) % 100
      val splitId = when(bucket < 80, 0L).when(bucket < 90, 1L).otherwise(2L)
      val tagged = Tables(s, d, "documents")
        .select($"doc_id", splitId.as("split_id"),
          wordHash(concat(lit("shuffle:"), idStr)).as("shuffle_key"))
        .withColumn("sort_key", $"split_id" * lit(P) + $"shuffle_key")
      val ord = graft.operators.GlobalOrder
        .zipOrdinal(tagged, Seq($"sort_key", $"doc_id"))
      val offsets = ord.groupBy($"split_id").agg(min($"__ord").as("off"))
      ord.join(broadcast(offsets), Seq("split_id"))
        .select($"doc_id",
          when($"split_id" === 0, "train").when($"split_id" === 1, "val")
            .otherwise("test").as("split"),
          $"shuffle_key", ($"__ord" - $"off").as("pos"))
    }
  )

  def oracle: Map[String, String] = Map(
    "pipe_chunk_overlap" ->
      s"""WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS ws,
                   len(string_split(text, ' ')) AS n
            FROM documents),
          k AS (
            SELECT doc_id, source, ws, n,
              UNNEST(range(0, 1 + CAST(floor(
                (greatest(n - $ChunkSize, 0) + ${Stride - 1}) / $Stride.0)
                AS BIGINT))) AS k
            FROM w)
          SELECT doc_id, source, k AS chunk_id,
                 1 + k * $Stride AS tok_start,
                 len(list_slice(ws, 1 + k * $Stride,
                     least(k * $Stride + $ChunkSize, n))) AS n_chunk_toks,
                 array_to_string(list_slice(ws, 1 + k * $Stride,
                     least(k * $Stride + $ChunkSize, n)), ' ') AS chunk_text
          FROM k""",

    "pipe_pack_shards" ->
      s"""WITH t AS (
            SELECT source, doc_id % 4 AS shard, doc_id,
              len(string_split(text, ' ')) AS n_tok,
              CAST(SUM(len(string_split(text, ' '))) OVER (
                PARTITION BY source, doc_id % 4 ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM documents)
          SELECT source, shard,
                 CAST(floor((cum - n_tok) / $Budget.0) AS BIGINT) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                 MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          FROM t GROUP BY 1, 2, 3""",

    "pipe_pack_sequences" ->
      s"""WITH t AS (
            SELECT source, doc_id,
              len(string_split(text, ' ')) AS n_tok,
              CAST(SUM(len(string_split(text, ' '))) OVER (
                PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM documents)
          SELECT source, CAST(floor((cum - n_tok) / $Budget.0) AS BIGINT) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                 MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          FROM t GROUP BY 1, 2""",

    "pipe_tokenize_pack" ->
      s"""${BpeQueries.trainCtesSql},
          tok AS (
            SELECT source, doc_id,
              CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(text, ' '),
                  w -> CAST(len(string_split(ltrim(${BpeQueries.encWordSql}), ' ')) AS BIGINT))),
                (x, y) -> x + y) AS BIGINT) AS n_tok
            FROM documents, ${BpeQueries.bJoinsSql}),
          c AS (
            SELECT source, doc_id, n_tok,
              CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM tok)
          SELECT source, CAST(floor((cum - n_tok) / $BpeBudget.0) AS BIGINT) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens,
                 MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
          FROM c GROUP BY 1, 2""",

    "pipe_shuffle_split" ->
      s"""WITH t AS (
            SELECT doc_id,
              ${wordHashSql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
              ${wordHashSql("'shuffle:' || CAST(doc_id AS VARCHAR)")} AS shuffle_key
            FROM documents),
          s AS (
            SELECT doc_id,
              CASE WHEN bucket < 80 THEN 'train'
                   WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
              shuffle_key
            FROM t)
          SELECT doc_id, split, shuffle_key,
            ROW_NUMBER() OVER (PARTITION BY split
                               ORDER BY shuffle_key, doc_id) - 1 AS pos
          FROM s"""
  )
}
