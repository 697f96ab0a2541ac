package graft
import org.apache.spark.sql.SparkSession
/** Throwaway A/B: same session (configured exactly as Bench), gate on
  * (default) vs gate dropped (=1 byte forces the probe) for the
  * probe-affected queries. */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env("SPARK_GRAFT_SF_DIR")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors()).toString
    val s = EngineConf.configure(SparkSession.builder()
      .master(s"local[$cpus]").appName("abprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val qs = Seq("agg_minmax_nunique", "agg_bkt_nunique", "win_rank_average", "win_rank_hist")
    def run(n: String): Double = {
      val t0 = System.nanoTime
      SparkEntry.queries(n)(s, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime - t0) / 1e9
    }
    qs.foreach(run) // warm
    for (gate <- Seq("default", "1", "default2")) {
      if (gate == "1") s.conf.set("graft.adaptive.probeGateBytes", "1")
      else s.conf.unset("graft.adaptive.probeGateBytes")
      val res = qs.map(n => n -> (1 to 5).map(_ => run(n)).min)
      println(s"ABPROBE gate=$gate " + res.map { case (n, t) => f"$n=$t%.3f" }.mkString(" "))
    }
    s.stop()
  }
}
