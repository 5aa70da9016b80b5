package graft.streaming

import graft.queries.GQ

/** Structured Streaming operators (SURVEY §2 D). */
object Streams {
  val queries: Seq[GQ] = Seq()
}
