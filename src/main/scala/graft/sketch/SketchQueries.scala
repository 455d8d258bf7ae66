package graft.sketch

import graft.GQuery

/** Sketch aggregates: bloom, tug-of-war (AMS), minhash, time-series
  * similarity (SURVEY.md §2.B sketch_* rows). */
object SketchQueries {
  def queries: Seq[GQuery] = Seq()
}
