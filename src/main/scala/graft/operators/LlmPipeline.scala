package graft.operators

import graft.GQuery

/** LLM-data-pipeline operators: dedup family, similarity search, text
  * analysis, multimodal columns (SURVEY.md §2.C north-star extension). */
object LlmPipeline {
  def queries: Seq[GQuery] = Seq()
}
