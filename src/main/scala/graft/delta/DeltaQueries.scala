package graft.delta

import graft.queries.GQ

/** Oracle-checked queries that exercise the Delta layer end-to-end
  * (filled in as SURVEY §2 A lands).
  */
object DeltaQueries {
  val queries: Seq[GQ] = Seq()
}
