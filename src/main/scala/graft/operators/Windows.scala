package graft.operators

import graft.GQuery

/** Window functions, per-group top-k, as-of joins (SURVEY.md §2.C). */
object Windows {
  def queries: Seq[GQuery] = Seq()
}
