package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Exactly-once streaming ingestion across a restart.
  *
  * The file sink's transaction log + the source offset checkpoint are
  * what make a production ingest pipeline idempotent: a query can die
  * at any micro-batch boundary and be restarted from its checkpoint
  * without dropping or double-writing rows. This spec kills a running
  * stream mid-ingest (after at least one committed batch, before all
  * files are read) and restarts it from the same checkpoint; the final
  * sink must contain every source row exactly once.
  *
  * pandas has no analogue; on the cluster the same contract holds per
  * partition with the same code (the checkpoint/sink-log protocol is
  * storage-based, not single-JVM).
  */
class StreamRestartSpec extends SparkSpec {

  test("file-sink stream resumes from checkpoint exactly-once") {
    val s = spark
    import s.implicits._
    val base = "/tmp/graft_restart"
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"
    // fresh dirs per run
    def rm(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.exists()) {
        f.listFiles().foreach(c => if (c.isDirectory) rm(c.getPath) else c.delete())
        f.delete()
      }
    }
    Seq(srcDir, outDir, ckpt).foreach(rm)

    // stage the source in two TRANCHES (each as several files): run 1
    // drains tranche 1 to a clean stop; tranche 2 lands before the
    // restart. Deterministic on any machine — no polling race against
    // fast micro-batches (ADVICE r7) — and still a mid-ingest restart
    // from the source's point of view: half the input is unread when
    // run 1 stops.
    val src = spark.read.parquet(sf("0.01") + "/events.parquet")
      .select($"event_id", $"user_id", $"value")
    val Array(tranche1, tranche2) = src.randomSplit(Array(0.5, 0.5), seed = 7)
    tranche1.repartition(8).write.mode("append").parquet(srcDir)
    val total = src.count()
    val t1Count = tranche1.count()

    def startQuery() = spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()

    // run 1: drain tranche 1, then stop — checkpoint marks its files done
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterKill = spark.read.parquet(outDir).count()
    assert(afterKill === t1Count, "run 1 commits exactly tranche 1")
    assert(afterKill < total, "restart must start with unread input to prove anything")

    // tranche 2 lands while the stream is DOWN; run 2 must pick up
    // exactly the unread files (re-reading tranche 1 would duplicate)
    tranche2.repartition(8).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === total, "every source row exactly once")
    assert(out.select(countDistinct($"event_id")).head().getLong(0) === total,
      "no duplicated event_ids across the restart")
  }

  // The stream_curation dedup claim: the (source, digest) keys seen
  // before a crash live in the STATE STORE, so a duplicate arriving
  // after the restart is still suppressed. The source is staged with
  // every document duplicated across DIFFERENT files; the stream is
  // killed mid-ingest and resumed from the checkpoint. If dedup state
  // did not survive, any digest whose first copy committed in run 1
  // and whose second copy arrives in run 2 would be emitted twice.
  test("streaming dedup state survives a restart (curation shape)") {
    val s = spark
    import s.implicits._
    val base = "/tmp/graft_restart_dedup"
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"
    def rm(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.exists()) {
        f.listFiles().foreach(c => if (c.isDirectory) rm(c.getPath) else c.delete())
        f.delete()
      }
    }
    Seq(srcDir, outDir, ckpt).foreach(rm)

    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    // tranche 1 = every document once; tranche 2 (written only after
    // run 1 stops) = a full second copy. Deterministic: every tranche-2
    // row is a duplicate whose first copy committed in run 1, so ANY
    // emission in run 2 proves state loss — no polling race (ADVICE r7).
    docs.repartition(8).write.mode("append").parquet(srcDir)
    val expectDistinct = docs
      .filter($"n_chars".between(100, 2000) && $"lang".isin("en", "es", "de"))
      .select($"source", md5($"text")).distinct().count()

    def startQuery() = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .filter($"n_chars".between(100, 2000) && $"lang".isin("en", "es", "de"))
      .withColumn("digest", md5($"text"))
      .dropDuplicates("source", "digest")
      .select($"source", $"digest")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()

    // run 1: drain the single-copy tranche — every distinct key is now
    // in the state store and emitted exactly once
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    val afterRun1 = spark.read.parquet(outDir).count()
    assert(afterRun1 === expectDistinct, "run 1 emits each key once")

    // the duplicate tranche lands while the stream is DOWN; if dedup
    // state did not survive the restart, run 2 re-emits every key
    docs.repartition(8).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() === expectDistinct,
      "each (source, digest) exactly once across the restart")
    assert(out.distinct().count() === expectDistinct,
      "no duplicate emissions — dedup state survived the checkpoint restart")
  }
}
