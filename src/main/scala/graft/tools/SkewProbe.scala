package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnoses whether AQE's skew-join split fires on join_skew_plain
  * and under which configs: runs the query under several AQE config
  * sets, reports wall time and whether the final adaptive plan carries
  * a skew-split shuffle read. Usage: runMain graft.tools.SkewProbe <sfDir>
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors()).toString
    val spark = graft.EngineConf.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val trials: Seq[(String, Map[String, String])] = Seq(
      "default" -> Map(),
      "force" -> Map(
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"),
      "lowthresh" -> Map(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16MB"),
      "lowthresh+force" -> Map(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16MB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"))

    val keys = trials.flatMap(_._2.keys).distinct
    trials.foreach { case (label, confs) =>
      keys.foreach(spark.conf.unset)
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries("join_skew_plain")(spark, sfDir)
        df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val skewed = plan.contains("skew=true") ||
          plan.toLowerCase.contains("skewed")
        println(f"[skewprobe] $label rep$rep: $sec%.2f s skewSplit=$skewed")
      }
    }
    spark.stop()
  }
}
