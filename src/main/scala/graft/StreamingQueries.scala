package graft

import graft.Registry.Q

/** Event/stream analytics over the `events` table (windowed aggregation,
  * sessionization; Structured Streaming wrappers live in graft.streaming). */
object StreamingQueries {
  def all: Seq[Q] = Seq()
}
