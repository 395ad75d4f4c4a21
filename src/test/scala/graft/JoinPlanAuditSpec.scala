package graft

/**
 * Structural audit of the multi-join gate plans (q21–q24): the assertions
 * are the 100-TB contract, checked on the FINAL (post-AQE) physical plan —
 *  - no cartesian anywhere (a join tree this wide that degrades to
 *    CartesianProduct/BroadcastNestedLoopJoin is a planning bug, not a
 *    data-size accident);
 *  - the schema-bounded dimensions (region = 5 rows, nation = 25) reach
 *    the probe side as broadcasts — at ANY scale factor those joins must
 *    never shuffle both sides.
 * AQE may (and at test SF does) broadcast MORE than the bounded dims;
 * the audit asserts a lower bound, not an exact plan shape.
 */
class JoinPlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Final executed-plan string: collect() first so AQE has re-planned. */
  private def finalPlan(name: String): String = {
    val df = JoinQueries.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def audit(name: String, minBroadcastJoins: Int): Unit = {
    val plan = finalPlan(name)
    assert(!plan.contains("CartesianProduct"),
      s"$name degraded to a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$name degraded to a nested-loop join:\n$plan")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= minBroadcastJoins,
      s"$name: expected >= $minBroadcastJoins broadcast joins " +
        s"(bounded dims must broadcast), saw $bhj:\n$plan")
  }

  // q21: region→nation and nation→supplier are explicit bounded broadcasts
  test("q21 local-supplier volume: no cartesian, bounded dims broadcast") {
    audit("q21_local_supplier_volume", 2)
  }

  // q22: both nation sides broadcast into supplier/customer
  test("q22 volume shipping: no cartesian, both nation sides broadcast") {
    audit("q22_volume_shipping", 2)
  }

  // q23: region→nation→(customer), nation→supplier — 3 bounded broadcasts
  test("q23 market share: no cartesian, bounded dims broadcast") {
    audit("q23_market_share", 3)
  }

  // q24: nation→supplier broadcast
  test("q24 product profit: no cartesian, nation broadcasts") {
    audit("q24_product_profit", 1)
  }
}
