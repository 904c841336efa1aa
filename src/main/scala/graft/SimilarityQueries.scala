package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Registry.Q
import graft.etl.Sources.table
import graft.functions.{HashFunctions => H}

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exactness baseline, and a
  * multi-probe sign-LSH ANN as the scale path. Cosines are order-pinned
  * double folds, so both queries hash-match their DuckDB oracles.
  *
  * Scale notes (100 TB): the query set is broadcast — the corpus never
  * shuffles for scoring. Brute-force cost is |Q|·|corpus| dots; the
  * top-k window shuffles only |Q|·|corpus| scored rows partitioned by
  * query (for huge corpora, pre-reduce with a per-partition top-k before
  * the window). The ANN variant shuffles on the LSH bucket id instead,
  * touching only candidate buckets (~planes·corpus/2^planes rows per
  * probe set).
  */
object SimilarityQueries {

  /** Every 50th vector is a query point. */
  private val QueryMod = 50
  private val Dims = 64

  /** Brute-force exact top-k (k=5) by cosine, ties broken by neighbor id. */
  val knnBrute: Q = Q(
    "sim_knn_brute",
    (s, dir) => {
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val queries = e.filter(col("vec_id") % QueryMod === 0)
        .toDF("query_id", "q_emb")
      val scored = e.toDF("neighbor_id", "n_emb")
        .crossJoin(broadcast(queries))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          H.cosine(col("q_emb"), col("n_emb")).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("query_id", "rank")
    },
    Some(
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM e WHERE vec_id % $QueryMod = 0),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         ${H.cosineSql("q.q_emb", "e.embedding")} AS cosine
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin))

  /** Multi-probe sign-LSH ANN: 8-plane sketch buckets; each query probes
    * its own bucket plus the 8 Hamming-1 neighbors, scores only the
    * candidates it meets there, and keeps top-3. Approximate by design —
    * the oracle checks the algorithm (identical buckets, probes, and
    * scores), not equality with the exact k-NN. */
  val annLsh: Q = Q(
    "sim_ann_lsh",
    (s, dir) => {
      val planes = 8
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val sk = e.withColumn("sketch", H.hyperplaneSketch(col("embedding"), Dims, planes))
      val probes = sk.filter(col("vec_id") % QueryMod === 0)
        .toDF("query_id", "q_emb", "q_sketch")
        .select(col("query_id"), col("q_emb"),
          explode(array(
            col("q_sketch") +: (0 until planes)
              .map(b => col("q_sketch").bitwiseXOR(lit(1L << b))): _*))
            .as("sketch"))
      val scored = sk.toDF("neighbor_id", "n_emb", "sketch")
        .join(probes, Seq("sketch"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          H.cosine(col("q_emb"), col("n_emb")).as("cosine"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy("query_id", "rank")
    },
    Some {
      val planes = 8
      val probeList = ("sk.sketch" +: (0 until planes)
        .map(b => s"xor(sk.sketch, ${1L << b})")).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |sk AS (SELECT vec_id, embedding, ${H.hyperplaneSketchSql("embedding", Dims, planes)} AS sketch FROM e),
         |probes AS (
         |  SELECT sk.vec_id AS query_id, sk.embedding AS q_emb, unnest($probeList) AS sketch
         |  FROM sk WHERE sk.vec_id % $QueryMod = 0),
         |scored AS (
         |  SELECT p.query_id, c.vec_id AS neighbor_id,
         |         ${H.cosineSql("p.q_emb", "c.embedding")} AS cosine
         |  FROM probes p JOIN sk c USING (sketch)
         |  WHERE c.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin
    })

  def all: Seq[Q] = Seq(knnBrute, annLsh)
}
