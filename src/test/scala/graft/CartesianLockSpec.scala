package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** Registry-wide cartesian lock (the Round5PlanSpec pattern, applied to
  * joins): a join with NO condition multiplies partitions pairwise —
  * fatal at 100 TB unless one side is BOUNDED independent of the
  * corpus. Three bounded shapes are sanctioned, each used deliberately
  * in the repo:
  *
  *   - a provably ≤1-row side (global aggregate / one-row relation /
  *     LIMIT 1) — the scalar-broadcast idiom carrying a corpus-level
  *     statistic into every row's expression;
  *   - a literal bounded Range (pa_multi's 10-row class table,
  *     sketch_bloom_portable's 4-row lane grid) — size is a compile-time
  *     constant;
  *   - an explicit BROADCAST hint on a side (mf_topk's ≤50-row query
  *     band) — the definition site's assertion of boundedness, which
  *     Spark enforces loudly (a broadcast that outgrows the driver
  *     fails, it does not silently cartesian).
  *
  * An ACCIDENTAL keyless join has none of these, so it fails the suite:
  * an unbounded cartesian cannot slip into the registry unnoticed.
  */
class CartesianLockSpec extends SparkSpec {

  /** True when `plan` is provably at most one row at any data scale. */
  private def scalarSide(plan: LogicalPlan): Boolean = plan match {
    case Project(_, child)          => scalarSide(child)
    case Filter(_, child)           => scalarSide(child)
    case SubqueryAlias(_, child)    => scalarSide(child)
    case a: Aggregate               => a.groupingExpressions.isEmpty
    case l: LocalRelation           => l.data.lengthCompare(1) <= 0
    case _: OneRowRelation          => true
    case GlobalLimit(org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _), _) =>
      n <= 1
    case _                          => false
  }

  /** True when `plan` is a literal Range of at most `cap` rows (possibly
    * wrapped) — bounded by construction, corpus-independent. */
  private def boundedRange(plan: LogicalPlan, cap: Long = 64L): Boolean = plan match {
    case Project(_, child)       => boundedRange(child, cap)
    case Filter(_, child)        => boundedRange(child, cap)
    case SubqueryAlias(_, child) => boundedRange(child, cap)
    case r: Range                => (r.end - r.start).abs <= cap
    case _                       => false
  }

  test("every condition-less join in the registry has a bounded side") {
    val offenders = Registry.all.flatMap { q =>
      val plan = q.fn(spark, sfDir).queryExecution.optimizedPlan
      val bad = plan.collect {
        case j: Join
            if j.condition.isEmpty && (j.joinType == Cross || j.joinType == Inner) &&
              !scalarSide(j.left) && !scalarSide(j.right) &&
              !boundedRange(j.left) && !boundedRange(j.right) &&
              !j.hint.leftHint.exists(_.strategy.contains(
                org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) &&
              !j.hint.rightHint.exists(_.strategy.contains(
                org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) => j
      }
      if (bad.nonEmpty) Some(q.id) else None
    }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"condition-less joins with no bounded side (unbounded cartesian at " +
        s"scale — add a key, make one side a global aggregate/bounded " +
        s"Range, or assert boundedness with broadcast()): " +
        s"${offenders.mkString(", ")}")
  }
}
