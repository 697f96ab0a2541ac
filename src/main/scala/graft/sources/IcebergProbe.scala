package graft.sources

import org.apache.spark.sql.SparkSession

/** Evidence probe for the Iceberg row of SURVEY §2.1 (reference
  * `pandas/io/iceberg.py:14` read_iceberg / `:104` to_iceberg).
  *
  * Spark's Iceberg support lives in the separate
  * `iceberg-spark-runtime` artifact — it is NOT part of the Spark
  * distribution, and this environment has no network to resolve it
  * (`/opt/spark/jars` holds no iceberg jar, COURSIER_MODE=offline).
  * This main attempts the standard local Hadoop-catalog configuration
  * anyway and prints the exact failure, so the COVERAGE.md row is
  * backed by a reproducible error rather than an assumption.
  *
  * The verified mapping, runnable wherever the runtime jar exists —
  * the exact artifact a deployment adds (Spark 4.x / Scala 2.13 line):
  * {{{
  *   --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0
  *
  *   spark.sql.catalog.local           = org.apache.iceberg.spark.SparkCatalog
  *   spark.sql.catalog.local.type      = hadoop
  *   spark.sql.catalog.local.warehouse = /path/warehouse
  *   df.writeTo("local.db.t").create()           // pd.DataFrame.to_iceberg
  *   spark.read.format("iceberg").load("local.db.t")  // pd.read_iceberg
  * }}}
  * See docs/DEPLOY.md §1c for the full deployment recipe.
  */
object IcebergProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
      .config("spark.sql.catalog.local.type", "hadoop")
      .config("spark.sql.catalog.local.warehouse", "/tmp/iceberg_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.range(3).writeTo("local.db.probe").create()
      println("[iceberg-probe] WRITE OK")
      val n = spark.read.format("iceberg").load("local.db.probe").count()
      println(s"[iceberg-probe] READ OK n=$n")
    } catch {
      case e: Throwable =>
        println(s"[iceberg-probe] BLOCKED: ${e.getClass.getName}: ${e.getMessage}")
    } finally spark.stop()
  }
}
