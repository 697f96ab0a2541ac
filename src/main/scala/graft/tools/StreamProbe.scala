package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway attribution probe for the stream_* sweep rows (round-15,
  * VERDICT r14 next-#4): runs one stream query N times under
  * different session confs and prints per-stage durations from a
  * listener, so the cost splits into scan / state / sink instead of
  * one opaque wall number. Not part of any query path.
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir> <query> [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors()).toString
    val spark = graft.EngineConf.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s)
          .getOrElse(-1L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(90), si.numTasks, dur))
      }
    })

    def run(tag: String): Unit = {
      (1 to reps).foreach { i =>
        stages.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let listener drain
        import scala.jdk.CollectionConverters._
        val byDur = stages.asScala.toSeq.sortBy(-_._4)
        println(f"[sprobe] $tag rep$i: $dt%.2f s, ${byDur.size} stages; slowest:")
        byDur.take(8).foreach { case (id, n, t, ms) =>
          println(f"[sprobe]   stage $id%4d $ms%6d ms $t%3d tasks  $n")
        }
      }
    }
    // auto (bytes-derived state partitions), then explicit counts to
    // verify the sizing rule's choice sits on the measured optimum
    run("auto")
    Seq(1, 2, 4, 8, 32).foreach { n =>
      graft.streaming.StreamQueries.statePartitionsDefault = Some(n)
      run(s"p$n")
    }
    graft.streaming.StreamQueries.statePartitionsDefault = None
    spark.stop()
  }
}
