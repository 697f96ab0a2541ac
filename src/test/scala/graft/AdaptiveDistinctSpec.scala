package graft

import org.apache.spark.sql.DataFrame
import graft.operators.AdaptiveDistinct

/** Pins the round-11 adaptive exact-nunique entry point (VERDICT r10
  * next-#1): one operator whose sketch probe picks EXPAND / CLUSTERED /
  * SPLIT (and BUCKETED when a serving layout is already materialized),
  * with all exact paths producing identical values — including null
  * group keys and null value combos — and the plan shapes pinned per
  * regime. Reference semantics: pandas groupby.nunique
  * (generic.py:890, :3096).
  */
class AdaptiveDistinctSpec extends SparkSpec {

  private val sets = Seq(
    "nu_b" -> Seq("b"),
    "nu_bc" -> Seq("b", "c"))

  /** combos ≪ rows → expand regime */
  private def lowCard: DataFrame = {
    import spark.implicits._
    (0 until 1600).map(i => (s"g${i % 2}", (i % 5).toLong, s"c${i % 3}"))
      .toDF("g", "b", "c")
  }

  /** every row a fresh combo, high-NDV anchor → clustered regime */
  private def nearUnique: DataFrame = {
    import spark.implicits._
    (0 until 1600).map(i => (s"g${i % 2}", i.toLong, s"c${i % 7}"))
      .toDF("g", "b", "c")
  }

  private def collectSorted(df: DataFrame): Seq[(Option[String], Long, Long)] =
    df.collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1.getOrElse(""))

  test("anchor candidates = intersection of the distinct sets") {
    assert(AdaptiveDistinct.anchorCandidates(sets) == Seq("b"))
    assert(AdaptiveDistinct.anchorCandidates(
      Seq("x" -> Seq("a"), "y" -> Seq("b"))).isEmpty)
  }

  test("probe picks expand at low combo cardinality, clustered otherwise") {
    val lo = AdaptiveDistinct.probe(lowCard, Seq("g"), sets)
    assert(lo.useExpand, s"expected expand regime: $lo")
    val hi = AdaptiveDistinct.probe(nearUnique, Seq("g"), sets)
    assert(!hi.useExpand, s"expected non-expand regime: $hi")
    assert(hi.anchor.contains("b"), s"anchor should be the high-NDV b: $hi")
    // a low-fanout anchor must NOT be chosen (parallelism collapse)
    val low = AdaptiveDistinct.Probe(1600, 1600, Map("b" -> 3L), 32)
    assert(low.anchor.isEmpty)
  }

  test("all exact paths agree, incl. null keys and null combos") {
    import spark.implicits._
    val df = ((0 until 300).map(i =>
        (if (i % 50 == 0) None else Some(s"g${i % 2}"),
         if (i % 7 == 0) None else Some((i % 40).toLong),
         s"c${i % 3}")) :+
        ((None: Option[String], None: Option[Long], null: String)))
      .toDF("g", "b", "c")
    val paths = Seq("expand", "clustered", "split")
    val outs = paths.map(p => p ->
      AdaptiveDistinct.nuniques(df, Seq("g"), sets, forcePath = p)
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1.getOrElse("")))
    val ref = outs.head._2
    assert(ref.exists(_._1.isEmpty), "a null-keyed group must survive")
    outs.tail.foreach { case (p, v) =>
      assert(v == ref, s"$p disagrees with ${outs.head._1}: $v vs $ref")
    }
  }

  test("adaptive entry matches the forced paths on both regimes") {
    for (df <- Seq(lowCard, nearUnique)) {
      val adaptive = collectSorted(
        AdaptiveDistinct.nuniques(df, Seq("g"), sets))
      val split = collectSorted(
        AdaptiveDistinct.nuniques(df, Seq("g"), sets, forcePath = "split"))
      assert(adaptive == split)
    }
  }

  test("clustered: every data-sized exchange is anchor-only and canonically ONE") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    // an exchange is data-sized when something scan/source-like sits
    // below it with no intervening aggregate (same structural check as
    // PlanHygieneSpec's bucketed-distinct test). Checked on sparkPlan
    // (pre-AQE) so exchanges are visible as plain nodes.
    def rawBelow(n: SparkPlan): Boolean = n match {
      case _: BaseAggregateExec => false
      case s if s.nodeName.contains("Scan") || s.nodeName.contains("LocalTable") => true
      case other => other.children.exists(rawBelow)
    }
    val cl = AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets,
      forcePath = "clustered")
    val dataSized = cl.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec if e.children.exists(rawBelow) => e
    }
    assert(dataSized.nonEmpty, "clustered must shuffle the data once")
    dataSized.foreach { e =>
      val cols = e.outputPartitioning match {
        case h: HashPartitioning =>
          h.expressions.collect { case a: AttributeReference => a.name }
        case other => fail(s"unexpected partitioning $other")
      }
      // the real property: the anchor column only — never the full
      // (g, b) / (g, b, c) widths the naive split plan re-shuffles on
      assert(cols == Seq("b"),
        s"data-sized exchange must partition on the anchor only, got $cols")
    }
    // both count branches must canonicalize to the SAME exchange so
    // runtime stage reuse pays it once
    assert(dataSized.map(_.canonicalized).distinct.size == 1,
      "branch exchanges must be identical for reuse")
    val ex = AdaptiveDistinct.nuniques(lowCard, Seq("g"), sets,
      forcePath = "expand")
    assert(ex.queryExecution.sparkPlan.toString.contains("Expand"),
      "expand path must plan the multi-distinct Expand")
  }

  test("extraAggs fold into the single-Aggregate paths and join on the dedup paths") {
    import org.apache.spark.sql.functions.{min, max, count, lit}
    val extras = Seq(min(org.apache.spark.sql.functions.col("b")).as("min_b"),
      max(org.apache.spark.sql.functions.col("b")).as("max_b"),
      count(lit(1)).as("n"))
    def run(p: String) = AdaptiveDistinct.nuniques(
        nearUnique, Seq("g"), sets, forcePath = p, extraAggs = extras)
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("nu_b"), r.getAs[Long]("nu_bc"),
        r.getAs[Long]("min_b"), r.getAs[Long]("max_b"), r.getAs[Long]("n")))
      .toSeq.sortBy(_._1)
    val ex = run("expand")
    assert(run("clustered") == ex, "clustered+extras disagrees with expand+extras")
    assert(run("split") == ex, "split+extras disagrees with expand+extras")
    // the expand form must be ONE aggregate over one scan — no join
    val plan = AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets,
      forcePath = "expand", extraAggs = extras).queryExecution.sparkPlan.toString
    assert(!plan.contains("Join"), s"expand+extras must not plan a join:\n$plan")
  }

  test("size gate: below it adaptive takes SPLIT with no probe; above it probes") {
    // round-11 verdict #1: lowCard is exactly the data the probe WOULD
    // route to EXPAND, but under the default 256 MB gate the tiny
    // frame takes the shape-robust SPLIT plan — no Expand in the plan
    // proves the probe never ran, so small-frame nunique() is fully
    // lazy. (Round-14 measured EXPAND-below-gate and rejected it; see
    // the gate comment in AdaptiveDistinct.)
    val gated = AdaptiveDistinct.nuniques(lowCard, Seq("g"), sets)
    assert(!gated.queryExecution.sparkPlan.toString.contains("Expand"),
      "gated adaptive must take SPLIT (no probe, no Expand)")
    spark.conf.set(AdaptiveDistinct.probeGateBytesKey, "1")
    try {
      val probed = AdaptiveDistinct.nuniques(lowCard, Seq("g"), sets)
      assert(probed.queryExecution.sparkPlan.toString.contains("Expand"),
        "above the gate the probe must route low-combo data to Expand")
      assert(collectSorted(gated) == collectSorted(probed),
        "gate changes the plan, never the values")
    } finally spark.conf.unset(AdaptiveDistinct.probeGateBytesKey)
  }

  test("probe input is bounded by the sample cap; values stay exact") {
    spark.conf.set(AdaptiveDistinct.probeGateBytesKey, "1")
    spark.conf.set(AdaptiveDistinct.probeSampleBytesKey, "1")
    try {
      // degenerate cap: the probe sees a near-empty sample — the plan
      // choice may differ, but every exact path agrees by construction
      val out = collectSorted(AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets))
      val ref = collectSorted(
        AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets, forcePath = "split"))
      assert(out == ref)
    } finally {
      spark.conf.unset(AdaptiveDistinct.probeGateBytesKey)
      spark.conf.unset(AdaptiveDistinct.probeSampleBytesKey)
    }
  }

  test("bucketed path requires a layout that anchors every set") {
    intercept[IllegalArgumentException] {
      AdaptiveDistinct.nuniques(lowCard, Seq("g"), sets, forcePath = "bucketed")
    }
    // a layout bucketed on a column NOT in every set must not serve
    intercept[IllegalArgumentException] {
      AdaptiveDistinct.nuniques(lowCard, Seq("g"), sets,
        layout = Some((lowCard, "c")), forcePath = "bucketed")
    }
  }

  test("approx path honors the error contract and is never probe-chosen") {
    val exact = collectSorted(
      AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets, forcePath = "split"))
    val approx = collectSorted(
      AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets, maxRelErr = 0.02))
    assert(approx.size == exact.size)
    exact.zip(approx).foreach { case ((g, b1, c1), (g2, b2, c2)) =>
      assert(g == g2)
      assert(math.abs(b1 - b2) <= math.max(4, 0.1 * b1), s"$g nu_b: $b1 vs $b2")
      assert(math.abs(c1 - c2) <= math.max(4, 0.1 * c1), s"$g nu_bc: $c1 vs $c2")
    }
    // with maxRelErr = 0 the adaptive entry must stay exact
    val adaptive = collectSorted(
      AdaptiveDistinct.nuniques(nearUnique, Seq("g"), sets))
    assert(adaptive == exact)
  }
}
