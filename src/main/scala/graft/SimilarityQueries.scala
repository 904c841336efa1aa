package graft

import graft.Registry.Q

/** Similarity search over the `embeddings` table (brute-force cosine
  * top-k baseline; LSH-bucketed scale path). */
object SimilarityQueries {
  def all: Seq[Q] = Seq()
}
