package graft.ps

import graft.GQuery

/** Parameter-server framework restated on Spark (pull=join, push=agg+merge,
  * iterate=driver loop — SURVEY.md §2.A/§3.4) + algorithm slices (§2.B). */
object PsQueries {
  def queries: Seq[GQuery] = Seq()
}
