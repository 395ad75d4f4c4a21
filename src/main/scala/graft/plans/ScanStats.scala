package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/**
 * Statistics plumbing for the DSv2 catalog read path.
 *
 * `V2ScanRelationPushDown` wraps every `V1Scan` in a `V1ScanWrapper` that
 * forwards `readSchema` but NOT `SupportsReportStatistics`, so
 * `DataSourceV2ScanRelation.computeStats` falls back to
 * `defaultSizeInBytes` ("assume huge") and the join planner never
 * auto-broadcasts a graft catalog table — no matter what the underlying
 * scan reports. This rule, which must run AFTER the pushdown batch
 * (`injectPreCBORule` / `experimental.extraOptimizations` both qualify),
 * re-wraps with a stats-forwarding subclass. `DataSourceV2Strategy`'s
 * physical match on `V1ScanWrapper` is unaffected: the subclass is still
 * a `V1ScanWrapper` to both `instanceof` and its case-class `unapply`.
 */
object GraftScanStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation if needsRewrap(r) =>
      val w = r.scan.asInstanceOf[V1ScanWrapper]
      r.copy(scan = new StatsV1ScanWrapper(w))
  }

  private def needsRewrap(r: DataSourceV2ScanRelation): Boolean = r.scan match {
    case _: StatsV1ScanWrapper => false
    case w: V1ScanWrapper => w.v1Scan.isInstanceOf[SupportsReportStatistics]
    case _ => false
  }
}

/** A `V1ScanWrapper` that forwards the wrapped scan's statistics.
  *
  * Equality is deliberately NOT inherited: the case-class equals would
  * make the rewrapped node `==` the original, and `TreeNode.transform`
  * drops any rewrite whose result `fastEquals` the input — the rule
  * would silently never apply. */
final class StatsV1ScanWrapper(w: V1ScanWrapper)
  extends V1ScanWrapper(w.v1Scan, w.handledFilters, w.pushedDownOperators)
  with SupportsReportStatistics {
  override def estimateStatistics(): Statistics =
    w.v1Scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
  override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
}
