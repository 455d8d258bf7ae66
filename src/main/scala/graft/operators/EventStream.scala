package graft.operators

import graft.GQuery

/** Event-time streaming semantics in batch form (tumble/slide/session/
  * watermark/stateful/dedup — SURVEY.md §2.C "Streaming semantics"). */
object EventStream {
  def queries: Seq[GQuery] = Seq()
}
