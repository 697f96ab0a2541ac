// quick row-count probe for a SparkEntry query (no dump, no shuffle-to-disk write)
package graft
import org.apache.spark.sql.SparkSession
object CountQ {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val spark = EngineConf.configure(SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS","64"))
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"COUNT $name = " + SparkEntry.queries(name)(spark, sfDir).count())
    spark.stop()
  }
}
