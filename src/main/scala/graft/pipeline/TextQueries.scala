package graft.pipeline

import graft.{QueryModule, Tables}
import graft.functions.PortableHash._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID
  * heuristic, quality scoring, token counting, document
  * fingerprinting. All map-side scalar expressions (codegen'd HOFs and
  * regexps, no UDFs) — at 100 TB these run in the scan stage with zero
  * shuffles.
  */
object TextQueries extends QueryModule {

  /** marker-word lists for the n-gram language heuristic */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"))

  private def words: Column = split(col("text"), " ")

  private def markerCount(ws: Seq[String]): Column =
    aggregate(words, lit(0L),
      (acc, w) => acc + when(w.isin(ws.map(lit): _*), 1L).otherwise(0L))

  private def markerCountSql(ws: Seq[String]): String = {
    val inList = ws.map(w => s"'$w'").mkString(", ")
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(text, ' '), w -> CASE WHEN w IN ($inList) THEN 1 ELSE 0 END)), " +
      s"(a, b) -> a + b)"
  }

  def queries: Map[String, Q] = Map(
    // language-ID: marker-word scores + argmax guess (fixed tiebreak
    // order), compared against the labeled lang
    "txt_langid" -> { (s, d) =>
      import s.implicits._
      val scored = Tables(s, d, "documents")
        .select(($"doc_id" +: $"lang".as("label_lang") +:
          Markers.map { case (l, ws) => markerCount(ws).as(s"score_$l") }): _*)
      val best = Markers.map(m => col(s"score_${m._1}")).reduce(greatest(_, _))
      val guess = Markers.foldRight(lit("und")) { case ((l, _), acc) =>
        when(col(s"score_$l") === best && best > 0, l).otherwise(acc)
      }
      // foldRight so earlier languages win ties (en > es > de > fr)
      scored.withColumn("guess", guess)
    },

    // quality scoring: length/word/stopword/punctuation ratios + a
    // composite score (deterministic double arithmetic)
    "txt_quality" -> { (s, d) =>
      import s.implicits._
      val nWords = size(words).cast("double")
      val nChars = length($"text").cast("double")
      val stop = markerCount(Markers.flatMap(_._2)).cast("double")
      Tables(s, d, "documents")
        .select($"doc_id",
          nChars.as("n_chars_d"),
          nWords.as("n_words"),
          round((nChars - nWords + 1) / nWords, 6).as("avg_word_len"),
          round(stop / nWords, 6).as("stopword_ratio"),
          round(least(nWords / 100.0, lit(1.0)) * (lit(1.0) - stop / nWords), 6)
            .as("quality_score"))
    },

    // token counting: whitespace tokens + BPE-ish regex token count +
    // distinct-token ratio
    "txt_tokens" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select($"doc_id",
          size(words).as("ws_tokens"),
          expr("regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')").as("re_tokens"),
          size(array_distinct(words)).as("distinct_tokens"),
          round(size(array_distinct(words)).cast("double") / size(words), 6)
            .as("ttr"))
    },

    // stratified sampling for training-data balancing: cap each
    // language at ~Cap docs via a per-group Bernoulli rate
    // (rate = Cap/n_lang). The per-lang counts are one tiny aggregate
    // broadcast back; the keep decision is then a pure map-side
    // integer predicate on a deterministic hash — no per-group window,
    // no skewed lang partitions, reproducible run to run. (The exact-
    // cap variant is the agg_group_head window shape; at 100 TB this
    // rate form is the one that scales, and the cap is honored in
    // expectation.)
    "txt_stratified_sample" -> { (s, d) =>
      import s.implicits._
      val Cap = 60L
      val M = 1000000L
      val counts = Tables(s, d, "documents")
        .groupBy($"lang").agg(count(lit(1)).as("n_lang"))
      Tables(s, d, "documents")
        .join(broadcast(counts), Seq("lang"))
        .withColumn("h", ($"doc_id" * 48271L) % M)
        .filter($"h" * $"n_lang" < Cap * M)
        .select($"doc_id", $"lang", $"n_lang", $"h")
    },

    // document fingerprint: portable rolling hash of the whole text +
    // md5 digest (both engine-portable)
    "txt_fingerprint" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select($"doc_id",
          wordHash($"text").as("poly_fp"),
          md5($"text").as("md5_fp"),
          substring(md5($"text"), 1, 8).as("md5_short"))
    },

    // corpus bigram frequency (the classic n-gram LM / contamination-
    // check primitive): bigrams are generated map-side per document
    // with a codegen'd transform — the only shuffle is the count
    // aggregation on the bigram key, partial-aggregated map-side, so
    // cost scales with distinct bigrams, not corpus size
    "txt_bigrams" -> { (s, d) =>
      import s.implicits._
      val w = words
      val bigrams = transform(
        sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1)))
      Tables(s, d, "documents")
        .select($"lang", explode(bigrams).as("bigram"))
        .groupBy($"lang", $"bigram")
        .agg(count(lit(1)).as("n"))
        .filter($"n" >= 20)
    }
  )

  def oracle: Map[String, String] = {
    val bestSql = Markers.map(m => s"score_${m._1}")
      .reduceRight((a, b) => s"GREATEST($a, $b)")
    val guessSql = Markers.reverse.foldLeft("'und'") { case (acc, (l, _)) =>
      s"CASE WHEN score_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    Map(
      "txt_langid" ->
        s"""WITH scored AS (
             SELECT doc_id, lang AS label_lang,
               ${Markers.map { case (l, ws) => s"${markerCountSql(ws)} AS score_$l" }.mkString(", ")}
             FROM documents),
           b AS (SELECT *, $bestSql AS best FROM scored)
           SELECT doc_id, label_lang,
             ${Markers.map(m => s"score_${m._1}").mkString(", ")},
             $guessSql AS guess
           FROM b""",

      "txt_quality" ->
        s"""SELECT doc_id,
           CAST(LENGTH(text) AS DOUBLE) AS n_chars_d,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
           ROUND((CAST(LENGTH(text) AS DOUBLE) - len(string_split(text, ' ')) + 1)
             / len(string_split(text, ' ')), 6) AS avg_word_len,
           ROUND(CAST(${markerCountSql(Markers.flatMap(_._2))} AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
             * (1.0 - CAST(${markerCountSql(Markers.flatMap(_._2))} AS DOUBLE)
                / len(string_split(text, ' '))), 6) AS quality_score
           FROM documents""",

      "txt_tokens" ->
        """SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS re_tokens,
           len(list_distinct(string_split(text, ' '))) AS distinct_tokens,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')), 6) AS ttr
           FROM documents""",

      "txt_stratified_sample" ->
        """WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1)
           SELECT d.doc_id, d.lang, c.n_lang, (d.doc_id * 48271) % 1000000 AS h
           FROM documents d JOIN c USING (lang)
           WHERE ((d.doc_id * 48271) % 1000000) * c.n_lang < 60 * 1000000""",

      "txt_fingerprint" ->
        s"""SELECT doc_id,
           ${wordHashSql("text")} AS poly_fp,
           md5(text) AS md5_fp,
           SUBSTR(md5(text), 1, 8) AS md5_short
           FROM documents""",

      "txt_bigrams" ->
        """WITH b AS (
             SELECT lang,
               unnest(list_transform(
                 range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' ||
                      string_split(text, ' ')[i + 1])) AS bigram
             FROM documents)
           SELECT lang, bigram, COUNT(*) AS n
           FROM b GROUP BY lang, bigram HAVING COUNT(*) >= 20"""
    )
  }
}
