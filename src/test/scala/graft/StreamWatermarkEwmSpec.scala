package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Row shape flowing into the stateful operator; `ts` carries the
  * watermark annotation, `tsm` is the exact-micros sort key. */
case class WmEvent(user_id: Long, tsm: Long, value: Double, ts: java.sql.Timestamp)

/** North-star streaming composition: watermark → stateful EWM →
  * exactly-once file sink, surviving a mid-ingest restart.
  *
  * This is the production shape of an online feature pipeline: the
  * watermark bounds how late data may arrive (rows older than the
  * watermark are dropped before they can corrupt per-key state), the
  * EWM state is checkpointed per micro-batch, and the file sink's
  * transaction log makes the emitted rows exactly-once across a crash.
  *
  * The fixture stages the events table as 12 time-bucketed files
  * ingested oldest-first (one per trigger); a deterministic subset of
  * events is displaced 3 buckets into the future, making them hours
  * older than the watermark when they finally arrive — the spec
  * asserts they are dropped, the query is killed after at least two
  * committed batches and restarted from its checkpoint, and every
  * user's final (count, EWM) exactly equals a driver-side fold over
  * the non-late events in event-time order.
  *
  * pandas analogue: none (ewm exists, but not online/restartable);
  * reference window/ewm semantics per window/ewm.py. Runs at sf0.01 in
  * the suite; GRAFT_SPEC_SF=0.1 runs the same proof one decade up.
  */
class StreamWatermarkEwmSpec extends SparkSpec {

  test("watermark -> stateful EWM -> file sink: restart-safe, late data dropped") {
    val s = spark
    import s.implicits._
    val base = "/tmp/graft_wm_ewm"
    val srcDir = s"$base/src"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"
    def rm(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.exists()) {
        if (f.isDirectory) f.listFiles().foreach(c => rm(c.getPath))
        f.delete()
      }
    }
    Seq(srcDir, outDir, ckpt).foreach(rm)
    Files.createDirectories(Paths.get(srcDir))

    val sfDir = sf(sys.env.getOrElse("GRAFT_SPEC_SF", "0.01"))
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"value")
    val (minM, maxM) = ev
      .select(min(unix_micros($"ts")), max(unix_micros($"ts")))
      .as[(Long, Long)].head()
    val nb = 12
    val width = (maxM - minM) / nb + 1

    // bucket by event time; displace a deterministic subset 3 buckets
    // into the future => late by ~2 bucket-widths on arrival
    val staged = ev
      .withColumn("bucket", ((unix_micros($"ts") - minM) / width).cast("int"))
      .withColumn("late", $"bucket" <= 7 && $"event_id" % 37 === 0)
      .withColumn("file", when($"late", $"bucket" + 3).otherwise($"bucket"))
      .cache()

    // stage one parquet FILE per bucket, mtimes ascending so the file
    // source (oldest-first) ingests them in event-time order
    val t0 = System.currentTimeMillis()
    (0 until nb).foreach { j =>
      val tmp = s"$base/stage$j"
      staged.filter($"file" === j)
        .select($"event_id", $"user_id", $"ts", $"value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = Paths.get(f"$srcDir/b$j%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(t0 + j * 2000L))
      rm(tmp)
    }

    // driver-side expectation: per-user (n, ewm) over non-late events
    // in event-time order — the exact fold the stream must reproduce
    val kept = staged.filter(!$"late")
      .select($"user_id", unix_micros($"ts").as("tsm"), $"value")
      .as[(Long, Long, Double)].collect()
    val expected: Map[Long, (Long, Double)] = kept.groupBy(_._1).map {
      case (u, arr) =>
        var n = 0L; var y = 0.0
        arr.sortBy(_._2).foreach { case (_, _, x) =>
          y = if (n == 0) x else 0.9 * y + 0.1 * x; n += 1
        }
        u -> ((n, y))
    }
    val lateCount = staged.filter($"late").count()
    assert(lateCount > 0, "fixture must contain late events")

    val schema = spark.read.parquet(s"$srcDir/b00.parquet").schema
    def startQuery() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .withWatermark("ts", "1 millisecond")
      .select($"user_id", unix_micros($"ts").as("tsm"), $"value", $"ts")
      .as[WmEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          if (state.hasTimedOut) Iterator.empty
          else {
            val sorted = rows.toArray.sortBy(_.tsm)
            var (n, y) = state.getOption.getOrElse((0L, 0.0))
            sorted.foreach { e =>
              y = if (n == 0) e.value else 0.9 * y + 0.1 * e.value; n += 1
            }
            state.update((n, y))
            Iterator((user, n, y))
          }
      }
      .toDF("user_id", "n_events", "ewm")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()

    // run 1: let >=2 batches commit, then kill mid-ingest
    val q1 = startQuery()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    assert(spark.read.parquet(outDir).count() > 0,
      "first run should have committed at least one batch")

    // run 2: resume from the checkpoint (state + offsets + watermark)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    // final state per user = row with the largest n_events
    val finals = spark.read.parquet(outDir)
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"ewm")).as("f"))
      .select($"user_id", $"f.n_events", $"f.ewm")
      .as[(Long, Long, Double)].collect()

    assert(finals.length == expected.size, "one final row per user")
    finals.foreach { case (u, n, y) =>
      val (en, ey) = expected(u)
      assert(n == en, s"user $u: n=$n expected $en (late drop or restart dup)")
      assert(math.abs(y - ey) < 1e-9, s"user $u: ewm=$y expected $ey")
    }
    assert(finals.map(_._2).sum == kept.length.toLong,
      "total folded events == non-late events exactly once")
    staged.unpersist()
  }
}
