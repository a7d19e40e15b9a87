package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Q, QueryModule}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every gated capability (SURVEY.md §2) from the query
  * modules; each entry pairs a Spark DataFrame builder with (where
  * SQL-expressible) a DuckDB oracle the driver replays at sf0.01.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.queries.Relational,
    graft.queries.Relational2,
    graft.queries.Relational3,
    graft.queries.Relational4,
    graft.queries.Relational5,
    graft.queries.LlmText,
    graft.queries.LlmSim,
    graft.queries.LlmCluster,
    graft.queries.LlmPipeline,
    graft.queries.Multimodal,
    graft.queries.Engine,
    graft.streaming.StreamOps
  )

  private lazy val all: Map[String, Q] =
    modules.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }

  /** Keys whose oracle is gate-scale-only (quadratic recomputation of
    * an approximate operator's exact answer) — see [[Q.quadraticOracle]].
    * Dumped by [[Verify]] as `oracle_meta.json` for the replay tooling.
    */
  def quadraticOracles: Set[String] =
    all.collect { case (k, q) if q.quadraticOracle => k }.toSet
}
