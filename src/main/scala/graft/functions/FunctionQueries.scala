package graft.functions

import graft.GQuery

/** Scalar function families + UDF/UDAF/UDTF extension points (SURVEY §2.C). */
object FunctionQueries {
  def queries: Seq[GQuery] = Seq()
}
