package graft.pipeline

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer: distributed merge-training plus a map-side corpus
  * encode pass — the train/apply loop a real tokenizer pipeline runs
  * (pandas has no analogue; this is the LLM-pipeline surface of the
  * brief).
  *
  * Both engines share one representation trick: a word is kept as its
  * "spaced symbol string" with a LEADING separator per symbol
  * ("abc" -> " a b c"). Symbols never contain a space (words come from
  * split(text, ' ')), so applying a merge of pair (a, b) is exactly the
  * left-to-right non-overlapping string replace
  * `replace(s, " a b", " ab")` — the same greedy semantics BPE
  * specifies, and `replace` behaves identically in Spark and DuckDB.
  * That makes the oracle an exact replay: K unrolled CTE steps, each
  * re-deriving the argmax pair and applying the same replace.
  *
  * Scale shape (100 TB): the corpus is scanned ONCE to build the
  * word-frequency vocabulary (partial-aggregated groupBy); all K
  * training iterations run over the vocabulary frame only — per
  * iteration one map-side pair explode + one tiny (a, b) aggregate,
  * with `localCheckpoint` truncating lineage so the plan stays O(1)
  * deep. The driver holds only the K-row merge table. The encode pass
  * is pure map-side expression work (chain of K codegen'd replaces per
  * word), zero shuffles.
  */
object BpeQueries extends QueryModule {

  /** number of merges to train; oracle SQL is generated for the same K */
  val K = 12

  /** "abc" -> " a b c" (leading separator per symbol) */
  private def spaced(w: Column): Column = regexp_replace(w, "(.)", " $1")

  private def wordsOf: Column = split(col("text"), " ")

  /** Train K merges over the corpus vocabulary; driver state = K rows.
    * Tiebreak on equal counts is the pair string "a b" ascending —
    * binary string order in both engines. */
  def train(s: SparkSession, d: String, k: Int = K): Seq[(Int, String, String, Long)] = {
    import s.implicits._
    val vocab0 = Tables(s, d, "documents")
      .select(explode(wordsOf).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .select(spaced($"w").as("s"), $"wc")
      .localCheckpoint()
    // Round-15 (guide §2, partitioning-follows-data): the vocabulary
    // inherits the aggregate's shuffle partitioning, so all 2k+1
    // trainer jobs ran shuffle.partitions-sized stages over a
    // vocabulary-sized frame (31 rows at sf0.1). Size the partitions
    // from the materialized row count instead — the count job is
    // O(partitions) on the checkpointed blocks and amortizes over
    // every following iteration; a corpus whose vocabulary is
    // millions of words still gets a proportional partition count.
    val vParts = math.max(1, math.min(vocab0.rdd.getNumPartitions,
      math.ceil(vocab0.count() / 65536.0).toInt))
    var vocab =
      if (vParts < vocab0.rdd.getNumPartitions) vocab0.coalesce(vParts)
      else vocab0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 0 until k) {
      val syms = split(ltrim($"s"), " ")
      val best = vocab
        .select($"wc", syms.as("sy"))
        // guard size >= 2: Spark's sequence(1, 0) counts DOWN, it is
        // not empty like DuckDB's range(1, 1)
        .filter(size($"sy") >= 2)
        .select($"wc", explode(transform(sequence(lit(1), size($"sy") - 1),
          j => struct(element_at($"sy", j).as("a"),
            element_at($"sy", j + 1).as("b")))).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"wc").as("n"))
        .orderBy($"n".desc, concat_ws(" ", $"a", $"b").asc)
        .limit(1)
        .collect()
      require(best.nonEmpty,
        s"BPE train: vocabulary exhausted after $i merges (k=$k too large for this corpus)")
      val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((i + 1, a, b, n))
      vocab = vocab
        .select(replace($"s", lit(s" $a $b"), lit(s" $a$b")).as("s"), $"wc")
        .localCheckpoint()
    }
    merges.result()
  }

  /** per-word encode: spaced form, K replaces in merge-rank order,
    * leading separator stripped */
  private def encodeWord(merges: Seq[(Int, String, String, Long)])(w: Column): Column =
    ltrim(merges.foldLeft(spaced(w)) { case (sc, (_, a, b, _)) =>
      replace(sc, lit(s" $a $b"), lit(s" $a$b"))
    })

  /** per-doc BPE token count with the trained merges — map-side only
    * (the merge table rides along as string literals). Shared with
    * PackQueries' tokenize->pack composite. */
  private[pipeline] def bpeTokenCountOf(merges: Seq[(Int, String, String, Long)]): Column =
    aggregate(
      transform(wordsOf, w => size(split(encodeWord(merges)(w), " ")).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** oracle fragments shared with the tokenize->pack composite: the
    * K-step train CTE chain, the per-word encode expression (requires
    * [[bJoinsSql]] in the enclosing FROM), and that join list */
  private[pipeline] def trainCtesSql: String = trainCtes(K)
  private[pipeline] def encWordSql: String =
    (0 until K).foldLeft("""regexp_replace(w, '(.)', ' \1', 'g')""") {
      case (acc, i) =>
        s"replace($acc, ' ' || b$i.a || ' ' || b$i.b, ' ' || b$i.a || b$i.b)"
    }
  private[pipeline] def bJoinsSql: String =
    (0 until K).map(i => s"b$i").mkString(", ")

  def queries: Map[String, Q] = Map(
    // the learned merge table itself: rank, pair, weighted pair count
    "txt_bpe_train" -> { (s, d) =>
      import s.implicits._
      train(s, d).toDF("rank", "a", "b", "n")
    },

    // corpus encode with the learned merges: per-doc BPE token count
    // plus an md5 over the full encoded text — a hash-strength check
    // that every merge applied at every position identically.
    // Round-15 (guide §4): the encoded-words array is projected ONCE
    // and both outputs derive from it — the old single projection ran
    // the interpreted spaced+K-replace chain TWICE per word (once
    // under the count fold, once under the md5 join). The two-step
    // projection survives CollapseProject because the shared alias is
    // used twice and is non-cheap, so the chain evaluates once per
    // word by plan construction.
    "txt_bpe_encode" -> { (s, d) =>
      import s.implicits._
      val merges = train(s, d)
      val enc = encodeWord(merges) _
      Tables(s, d, "documents")
        .select($"doc_id", size(wordsOf).as("n_words"),
          transform(wordsOf, w => enc(w)).as("__enc"))
        .select(
          $"doc_id",
          $"n_words",
          aggregate(
            transform($"__enc", e => size(split(e, " ")).cast("long")),
            lit(0L), (acc, v) => acc + v).as("n_bpe_tokens"),
          md5(array_join($"__enc", " | ")).as("enc_md5"))
    }
  )

  /** K unrolled train steps as CTEs: v0 is the spaced vocabulary; step
    * i counts pairs of vi, picks argmax into bi, applies it into vi+1.
    * MATERIALIZED keeps the chain linear (each vi is referenced twice —
    * naive inlining would be exponential in K). */
  private def trainCtes(k: Int): String = {
    val spacedSql = """regexp_replace(w, '(.)', ' \1', 'g')"""
    val steps = (0 until k).map { i =>
      s"""p$i AS (
           SELECT pr, CAST(SUM(wc) AS BIGINT) AS n FROM (
             SELECT wc, UNNEST(list_transform(range(1, len(sy)),
               j -> sy[j] || ' ' || sy[j + 1])) AS pr
             FROM (SELECT string_split(ltrim(s), ' ') AS sy, wc FROM v$i))
           GROUP BY pr),
         b$i AS MATERIALIZED (
           SELECT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b, n
           FROM p$i ORDER BY n DESC, pr ASC LIMIT 1),
         v${i + 1} AS MATERIALIZED (
           SELECT replace(v.s, ' ' || b.a || ' ' || b.b, ' ' || b.a || b.b) AS s, v.wc
           FROM v$i v, b$i b)"""
    }.mkString(",\n")
    s"""WITH v0 AS MATERIALIZED (
         SELECT $spacedSql AS s, wc FROM (
           SELECT w, COUNT(*) AS wc FROM (
             SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
           GROUP BY w)),
       $steps"""
  }

  def oracle: Map[String, String] = {
    val trainSelect = (0 until K).map { i =>
      s"SELECT CAST(${i + 1} AS INTEGER) AS rank, a, b, n FROM b$i"
    }.mkString("\nUNION ALL\n")

    // nested replace chain in merge-rank order, patterns drawn from the
    // 1-row b0..b{K-1} CTEs cross-joined below
    val encSql = encWordSql
    val bJoins = bJoinsSql

    Map(
      "txt_bpe_train" ->
        s"""${trainCtes(K)}
           $trainSelect""",

      "txt_bpe_encode" ->
        s"""${trainCtes(K)}
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                 w -> CAST(len(string_split(ltrim($encSql), ' ')) AS BIGINT))),
               (x, y) -> x + y) AS BIGINT) AS n_bpe_tokens,
             md5(array_to_string(list_transform(string_split(text, ' '),
               w -> ltrim($encSql)), ' | ')) AS enc_md5
           FROM documents, $bJoins"""
    )
  }
}
