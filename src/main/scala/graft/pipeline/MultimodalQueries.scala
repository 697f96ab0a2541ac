package graft.pipeline

import graft.{QueryModule, Tables}
import graft.functions.PortableHash.{wordHashSql, P}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata, batch feature extraction over partitions.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * deterministic stub (byte statistics standing in for pixel/sample
  * decoding) — but the Spark-side plumbing is real: a `binary` payload
  * column, schema'd metadata, and `mapPartitions` batch processing
  * (the Scala analogue of `mapInPandas` batch UDFs: one JVM pass per
  * partition, no per-row UDF dispatch, executor-local batch state).
  * A real decoder would replace the byte loop only; partitioning,
  * schema, and batch shape are what the 100 TB design cares about.
  */
object MultimodalQueries extends QueryModule {

  def queries: Map[String, Q] = Map(
    // binary payload + typed metadata (octet length, content digest) —
    // the storage schema for opaque media blobs
    "mm_binary_meta" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select($"doc_id",
          encode($"text", "UTF-8").as("payload"))
        .select($"doc_id",
          length($"payload").as("n_bytes"),
          md5($"payload").as("digest"))
    },

    // batch "decode"/feature-extract via mapPartitions: byte stats as
    // stand-in features (deterministic stub; see scaladoc)
    "mm_decode_features" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            var sum = 0L
            var fp = 0L
            var i = 0
            while (i < bytes.length) {
              val b = bytes(i) & 0xff
              sum += b
              fp = (fp * 31 + b) % P
              i += 1
            }
            (id, bytes.length, sum.toDouble / bytes.length, fp)
          }
        }
        .toDF("doc_id", "n_bytes", "mean_byte", "byte_fp")
    },

    // audio framing: fixed-length overlapped windows over the sample
    // stream (frame_length=32, hop_length=16 — the spectrogram access
    // pattern; librosa/torchaudio framing semantics: full frames
    // only). One explode per frame, per-frame energy as the decode
    // stub — map-side fan-out, zero shuffles, the same shape a real
    // STFT pre-pass needs at corpus scale.
    "mm_audio_frames" -> { (s, d) =>
      import s.implicits._
      val frameLen = 32; val hop = 16
      val len = length($"text")
      val nf = (floor((len - frameLen) / hop) + 1).cast("long")
      val offset = $"k" * hop + 1
      val energy = aggregate(
        transform(sequence(offset, offset + (frameLen - 1)),
          i => ascii($"text".substr(i.cast("int"), lit(1))).cast("long")),
        lit(0L), (acc, x) => acc + x)
      Tables(s, d, "documents")
        .filter(len >= frameLen)
        .withColumn("k", explode(sequence(lit(0L), nf - 1)))
        .select($"doc_id", $"k".as("frame_id"),
          offset.as("sample_start"), energy.as("frame_energy"))
    },

    // frame sampling: stride-16 byte subsampling (the video
    // frame-sample access pattern) + fingerprint of the sampled frames
    "mm_frame_sample" -> { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select($"doc_id",
          aggregate(
            transform(sequence(lit(1), length($"text"), lit(16)),
              i => ascii($"text".substr(i, lit(1))).cast("long")),
            lit(0L),
            (acc, x) => (acc * 31 + x) % P).as("sampled_fp"),
          (floor((length($"text") - 1) / 16) + 1).cast("long").as("n_frames"))
    }
  )

  def oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         md5(text) AS digest
         FROM documents""",

    "mm_decode_features" ->
      s"""SELECT doc_id,
         LENGTH(text) AS n_bytes,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), x -> ascii(x))), (a, b) -> a + b) AS DOUBLE)
           / LENGTH(text) AS mean_byte,
         ${wordHashSql("text")} AS byte_fp
         FROM documents""",

    "mm_audio_frames" ->
      """WITH t AS (
           SELECT doc_id, text, LENGTH(text) AS len
           FROM documents WHERE LENGTH(text) >= 32),
         f AS (
           SELECT doc_id, text,
             UNNEST(range(0, (len - 32) // 16 + 1)) AS k
           FROM t)
         SELECT doc_id, k AS frame_id,
           k * 16 + 1 AS sample_start,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(k * 16 + 1, k * 16 + 33),
               i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
             (a, b) -> a + b) AS frame_energy
         FROM f""",

    "mm_frame_sample" ->
      s"""SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, LENGTH(text) + 1, 16), i -> ascii(substr(text, CAST(i AS INT), 1)))),
           (a, b) -> (a * 31 + b) % $P) AS sampled_fp,
         (LENGTH(text) - 1) // 16 + 1 AS n_frames
         FROM documents"""
  )
}
