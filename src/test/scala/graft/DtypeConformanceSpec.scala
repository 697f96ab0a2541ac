package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared dtype-conformance battery (SURVEY §5 test plan item c — the
  * analogue of pandas' extension-array conformance suite in
  * tests/extension/base/): one operator contract executed against a
  * column of every supported dtype, asserting the invariants that must
  * hold regardless of type.
  */
trait DtypeBattery { self: SparkSpec =>

  def checkDtype(df: DataFrame, colName: String, dtypeLabel: String): Unit = {
    test(s"dtype conformance [$dtypeLabel] $colName") {
      val total = df.count()
      val nonNull = df.filter(col(colName).isNotNull).count()
      val distinct = df.select(colName).distinct().count()
      assert(nonNull <= total)
      assert(distinct <= total)

      // min <= max under the dtype's ordering: nothing sorts outside
      val mm = df.agg(min(col(colName)).as("mn"), max(col(colName)).as("mx")).head()
      if (!mm.isNullAt(0) && !mm.isNullAt(1)) {
        val below = df.filter(col(colName) < lit(mm.get(0))).count()
        val above = df.filter(col(colName) > lit(mm.get(1))).count()
        assert(below == 0 && above == 0)
      }

      // groupBy partitioning: per-value counts sum back to nonNull+nulls
      val grouped = df.groupBy(col(colName)).agg(count(lit(1)).as("c"))
      val sumBack = grouped.agg(sum(col("c"))).head().getLong(0)
      assert(sumBack == total)
      assert(grouped.count() == df.select(colName).distinct().count())

      // dropDuplicates on the column == distinct cardinality
      assert(df.select(colName).dropDuplicates().count() == distinct)

      // orderBy round-trip preserves multiset size
      assert(df.orderBy(col(colName)).count() == total)
    }
  }
}

class DtypeConformanceSpec extends SparkSpec with DtypeBattery {
  private lazy val li = Tables(spark, sf(), "lineitem")
  private lazy val ev = Tables(spark, sf(), "events")
  private lazy val em = Tables(spark, sf(), "embeddings")

  checkDtype(li, "l_orderkey", "bigint")
  checkDtype(li, "l_linenumber", "int")
  checkDtype(li, "l_quantity", "double")
  checkDtype(li, "l_returnflag", "string")
  checkDtype(li, "l_shipdate", "timestamp_ntz")
  checkDtype(ev, "ts", "timestamp")
  checkDtype(ev.select((col("value") > 100).as("b")), "b", "boolean")
  checkDtype(li.select(col("l_quantity").cast("decimal(7,2)").as("dq")), "dq", "decimal")
  checkDtype(em.select(col("embedding").cast("string").as("es")), "es", "array-as-string")
}
