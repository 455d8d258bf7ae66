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
    for (side <- hintedSides) {
      val vocabAggs = side.collect {
        case a: Aggregate if a.aggregateExpressions.exists(_.name == "df") => a
      }
      assert(vocabAggs.isEmpty,
        "text_tfidf broadcasts the vocabulary df relation again — that side " +
          "is Heaps-law unbounded at corpus scale; broadcast the query-band " +
          s"tf slice instead. Offending side:\n$side")
    }
  }
}
