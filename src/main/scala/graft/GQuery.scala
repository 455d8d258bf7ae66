package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a qid from SURVEY.md §2, the Spark
  * implementation, and (when ANSI-SQL-expressible) the DuckDB oracle twin
  * the driver hash-compares against at sf0.01.
  *
  * Determinism contract (SURVEY.md §0.1): every query ends in a total-order
  * ORDER BY, pins NULL ordering, rounds/decimalizes float aggregates, and
  * uses only seeded/deterministic functions, so Spark and DuckDB produce
  * bitwise-identical results.
  */
final case class GQuery(
    id: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** All registered queries; populated by the per-family modules. */
  def all: Seq[GQuery] =
    graft.operators.Relational.queries ++
      graft.operators.Windows.queries ++
      graft.operators.EventStream.queries ++
      graft.functions.FunctionQueries.queries ++
      graft.operators.LlmPipeline.queries ++
      graft.ps.PsQueries.queries ++
      graft.sketch.SketchQueries.queries ++
      graft.streaming.StreamingQueries.queries

  def byId: Map[String, GQuery] = all.map(q => q.id -> q).toMap
}
