package graft

import graft.Registry.Q

/** Multimodal-column plumbing (binary payloads + typed metadata). */
object MultimodalQueries {
  def all: Seq[Q] = Seq()
}
