package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry: query name → (Spark implementation, optional DuckDB
  * oracle SQL). Grows one entry per operator from SURVEY.md §2 plus the
  * training-data pipeline extensions.
  *
  * Cache ownership: several query builders persist() multi-branch
  * subtrees (dedup signature/index tables, the trained IVF centroids);
  * the returned frame owns those entries for its lifetime. Callers that
  * compose many queries in one session should `spark.catalog
  * .clearCache()` between them (the Bench/Verify harnesses do) or
  * unpersist after materializing — accumulated caches measurably
  * throttled later queries in round-2 profiling (PERF.md).
  *
  * Oracle-parity rules (learned the hard way, keep following them):
  *  - every aggregate over doubles goes through an exact DECIMAL sum and
  *    is cast back to DOUBLE, so the result is bit-identical regardless
  *    of accumulation order on either engine;
  *  - ORDER BY only where it selects WHICH rows appear (top-k/LIMIT):
  *    the gate canon-sorts rows by all columns before hashing, so bulk
  *    outputs must not pay a global sort for it (r10 — dropping the
  *    four ETL loads' sorts halved pending_orders_load);
  *  - output column names/types are pinned identically on both sides;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all semantics.
  */
object Registry {

  case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def all: Seq[Q] = EtlQueries.all ++ WorQueries.all ++ AnalysisQueries.all ++
    DqQueries.all ++ TextQueries.all ++ DedupQueries.all ++
    SimilarityQueries.all ++ MultimodalQueries.all ++ StreamingQueries.all ++
    CurateQueries.all ++ PackQueries.all ++ TemporalJoinQueries.all ++
    CorpusQueries.all ++ JoinPatternQueries.all ++ SketchQueries.all ++
    TpchQueries.all ++ FeatureQueries.all

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
