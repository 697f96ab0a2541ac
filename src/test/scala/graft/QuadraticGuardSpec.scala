package graft

/** Pins the loud ceilings on the deliberately quadratic baselines:
  * with the cap lowered below the sf0.001 corpus size the guarded
  * queries must throw (with a pointer to the scale-safe twin), and
  * with default caps they must still run — the guard may never change
  * a query's result, only refuse to run it.
  */
class QuadraticGuardSpec extends SparkSpec {

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sim_cosine_pairs throws loudly above the row ceiling") {
    val e = withConf("graft.quadratic.maxRows", "10") {
      intercept[IllegalStateException] {
        SparkEntry.queries("sim_cosine_pairs")(spark, sf()).collect()
      }
    }
    assert(e.getMessage.contains("sim_lsh_multitable"))
    assert(e.getMessage.contains("graft.quadratic.maxRows"))
  }

  test("dedup_jaccard_pairs throws loudly above the row ceiling") {
    val e = withConf("graft.quadratic.maxRows", "10") {
      intercept[IllegalStateException] {
        SparkEntry.queries("dedup_jaccard_pairs")(spark, sf()).collect()
      }
    }
    assert(e.getMessage.contains("dedup_minhash_pairs"))
  }

  test("dedup_jaccard_pairs throws loudly above the blocking-df ceiling") {
    val e = withConf("graft.quadratic.maxKeyDf", "1") {
      intercept[IllegalStateException] {
        SparkEntry.queries("dedup_jaccard_pairs")(spark, sf()).collect()
      }
    }
    assert(e.getMessage.contains("graft.quadratic.maxKeyDf"))
  }

  test("default caps leave both baselines runnable and -1 disables") {
    assert(SparkEntry.queries("sim_cosine_pairs")(spark, sf()).count() >= 0)
    withConf("graft.quadratic.maxRows", "-1") {
      withConf("graft.quadratic.maxKeyDf", "-1") {
        assert(SparkEntry.queries("dedup_jaccard_pairs")(spark, sf()).count() >= 0)
      }
    }
  }
}
