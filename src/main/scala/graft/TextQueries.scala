package graft

import graft.Registry.Q

/** Text-analysis operators over the `documents` table (language-ID,
  * quality scoring, token counting, fingerprinting). */
object TextQueries {
  def all: Seq[Q] = Seq()
}
