package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch micro-benchmark for per-row expression cost hypotheses
  * (round-14 optimization). Not part of any query path.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    import spark.implicits._
    val li = graft.Tables(spark, sfDir, "lineitem")

    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      // warm
      f.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[micro] $name%-28s min=${ts.min}%.3f s  ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("count_only") {
      li.groupBy($"l_returnflag", $"l_linestatus").agg(count(lit(1)))
    }
    time("sum_double") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_extendedprice"))
    }
    time("sum_dec_cast") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_extendedprice".cast(DecimalType(18, 4))).cast("double"))
    }
    time("sum_long_rint") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg((sum(expr("cast(rint(l_extendedprice * 10000) as long)")) / 10000.0))
    }
    time("sum_dec_of_long") {
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(graft.OracleNum.dsum($"l_extendedprice"))
    }
    time("q1_shape_4casts") {
      li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(DecimalType(18, 4))).cast("double"),
          sum($"l_extendedprice".cast(DecimalType(18, 4))).cast("double"),
          sum($"l_extendedprice".cast("decimal(12,2)")).cast("double"),
          sum(($"l_extendedprice".cast("decimal(12,2)") * $"l_discount".cast("decimal(6,2)")).cast("decimal(38,4)")).cast("double"),
          count(lit(1)))
    }
    time("q1_shape_long_rint") {
      li.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(expr("cast(rint(l_quantity * 10000) as long)")),
          sum(expr("cast(rint(l_extendedprice * 10000) as long)")),
          sum(expr("cast(rint(l_extendedprice * 100) as long)")),
          sum(expr("cast(rint(l_extendedprice * 100) as long) * cast(rint(l_discount * 100) as long)")),
          count(lit(1)))
    }
    spark.stop()
  }
}
