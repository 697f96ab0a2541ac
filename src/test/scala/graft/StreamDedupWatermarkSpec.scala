package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** State EVICTION in dropDuplicatesWithinWatermark — the property that
  * makes streaming dedup viable at 100 TB/day (VERDICT r7 next-#7).
  *
  * `stream_dedup_watermark` verifies the exact-dedup contract against
  * the DuckDB oracle with a delay that covers the corpus span; this
  * spec pins the OTHER half of the contract with a short delay and
  * controlled event times: once the watermark passes a key's event
  * time + delay, its state is REMOVED from the store (bounded state),
  * and a later re-delivery of the same key is re-admitted — exactly
  * the "dedup within the SLA, forget beyond it" semantics, observed
  * both in the output and in the state-store metrics.
  *
  * Batching is deterministic: each tranche is written while the
  * stream is idle and drained with processAllAvailable(), so tranche
  * boundaries == micro-batch boundaries and the watermark for batch N
  * is computed from batches < N.
  */
class StreamDedupWatermarkSpec extends SparkSpec {

  test("expired dedup state is evicted and re-delivered keys re-admit") {
    val s = spark
    import s.implicits._
    val base = "/tmp/graft_wm_dedup"
    val srcDir = s"$base/src"
    def rm(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.exists()) {
        f.listFiles().foreach(c => if (c.isDirectory) rm(c.getPath) else c.delete())
        f.delete()
      }
    }
    rm(base)
    new java.io.File(srcDir).mkdirs()

    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Int): Timestamp =
      new Timestamp(t0.getTime + hours * 3600L * 1000L)
    def tranche(keys: Range, ts: Timestamp): Unit =
      keys.map(k => (k.toLong, ts)).toDF("k", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)

    // tranche 1 = keys 0..99 at t0
    tranche(0 until 100, at(0))

    val name = "wm_dedup_spec"
    val q = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .parquet(srcDir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .select($"k")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() === 100, "tranche 1: every key once")

      // tranche 2 = DISJOINT keys 2h later: advances the watermark far
      // past tranche 1's expiry (t0 + 10 min) without touching keys A
      tranche(100 until 150, at(2))
      q.processAllAvailable()
      assert(spark.table(name).count() === 150)

      // tranche 3 = keys 0..99 AGAIN at t0+4h: their state expired, so
      // they must RE-ADMIT — plain dropDuplicates would suppress them
      // forever (and hold every key ever seen in the store)
      tranche(0 until 100, at(4))
      q.processAllAvailable()
      assert(spark.table(name).count() === 250,
        "re-delivered keys after state expiry must be re-emitted")

      // the store really evicted rows (bounded state), visible in the
      // state operator metrics
      val removed = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
      assert(removed >= 100,
        s"state store must evict expired keys (numRowsRemoved=$removed)")

      // bounded state, the 100 TB/day claim (VERDICT r8 next-#6): the
      // store's TOTAL row count must plateau/decrease once the
      // watermark passes the duplicate horizon — never reach the
      // 250 keys-ever-seen a plain dropDuplicates would hold. After
      // tranche 3 the watermark (t0+4h − 10min) is past every earlier
      // tranche's expiry, so at most tranche 3's own 100 keys remain.
      val totals = q.recentProgress.toSeq
        .flatMap(p => p.stateOperators.map(_.numRowsTotal))
      assert(totals.nonEmpty, "expected state operator metrics")
      assert(totals.max < 250,
        s"state must never hold every key ever seen (numRowsTotal=$totals)")
      assert(totals.last <= 100,
        s"after the horizon passed, only the live tranche's keys may " +
          s"remain in the store (numRowsTotal=$totals)")
    } finally {
      q.stop()
    }
  }
}
