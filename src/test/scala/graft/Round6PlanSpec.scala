package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Round-6 plan lock (this round's scale audit): text_tfidf originally
  * carried its BROADCAST hint on the document-frequency relation — the
  * full corpus VOCABULARY, Heaps-law unbounded on a real crawl — and
  * only looked fine because the fixture vocabulary fits in a broadcast.
  * The fix moved the hint to the genuinely bounded side (the ≤100-doc
  * query-band tf slice). This suite pins the direction: every
  * broadcast-hinted side in text_tfidf's plan must be corpus-bounded —
  * either a ≤1-row aggregate (the nDocs scalar) or a plan whose leaves
  * are reached through a bounded doc_id band filter — and in
  * particular must NOT contain the vocabulary df aggregate.
  */
class Round6PlanSpec extends SparkSpec {

  test("text_tfidf broadcasts the query-band tf slice, never the vocabulary df") {
    val plan = operators.LlmPipeline.textTfidf(spark, sfDir)
      .queryExecution.optimizedPlan
    val hintedSides = plan.collect {
      case j: Join =>
        Seq(
          j.hint.leftHint.filter(_.strategy.contains(BROADCAST)).map(_ => j.left),
          j.hint.rightHint.filter(_.strategy.contains(BROADCAST)).map(_ => j.right)
        ).flatten
    }.flatten
    assert(hintedSides.nonEmpty,
      "text_tfidf lost its broadcast hints entirely — the query-band tf " +
        "slice is the intended bounded build side")
    // Structural boundedness check (round 7 — the original version
    // looked for an aggregate output literally named "df", which a
    // rename would silently disarm): a hinted side is corpus-bounded
    // iff it is a global (no-grouping, ≤1-row) aggregate, OR every
    // grouped aggregate in it sits above a doc_id band filter — the
    // shape the fix installed. A grouped aggregate over the unfiltered
    // corpus (the vocabulary df relation, whatever its aliases) has
    // neither property and fails here.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryComparison, Literal}
    // a genuine BAND filter: doc_id compared against a LITERAL bound.
    // Accepting any comparison that merely references doc_id would let
    // a pushed equi-join predicate (or doc_id = doc_id) satisfy the
    // boundedness lock on a corpus-unbounded side.
    def hasDocIdBand(p: LogicalPlan): Boolean = p.collectFirst {
      case f: Filter if f.condition.exists {
        case cmp: BinaryComparison => (cmp.left, cmp.right) match {
          case (a: AttributeReference, _: Literal) => a.name == "doc_id"
          case (_: Literal, a: AttributeReference) => a.name == "doc_id"
          case _ => false
        }
        case _ => false
      } => f
    }.isDefined
    for (side <- hintedSides) {
      val isScalarAgg = side match {
        case a: Aggregate if a.groupingExpressions.isEmpty => true
        case _ => false
      }
      if (!isScalarAgg) {
        assert(hasDocIdBand(side),
          "a broadcast-hinted side of text_tfidf has no doc_id band filter " +
            s"and is not a scalar aggregate — unbounded at corpus scale:\n$side")
        val unboundedGroupedAggs = side.collect {
          case a: Aggregate if a.groupingExpressions.nonEmpty && !hasDocIdBand(a) => a
        }
        assert(unboundedGroupedAggs.isEmpty,
          "text_tfidf broadcasts a grouped aggregate over the unfiltered " +
            "corpus (the vocabulary df shape, whatever its column names) — " +
            "that side is Heaps-law unbounded at corpus scale; broadcast the " +
            s"query-band tf slice instead. Offending aggregate(s):\n" +
            unboundedGroupedAggs.mkString("\n"))
      }
    }
  }
}
