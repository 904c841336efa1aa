package graft

import graft.Registry.Q

/** Deduplication operators over the `documents` table (exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup). */
object DedupQueries {
  def all: Seq[Q] = Seq()
}
