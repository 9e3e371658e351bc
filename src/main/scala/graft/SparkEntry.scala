package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-module suites; every entry has a
  * DuckDB oracle in [[oracleSql]] unless the operator is not
  * SQL-expressible (driver then records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * extension modules (text analysis, dedup, similarity, streaming,
    * multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RefQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.OlapQueries.queries ++
      graft.queries.GraphQueries.queries

  /** The query map filtered by the `SPARK_GRAFT_ONLY` env var (comma
    * separated, trimmed; a blank value means unset). Shared by the
    * Bench and Verify mains so the parse/blank-guard/unknown-name
    * warning cannot drift between the two entry points again — an
    * allowlisted name matching no registered query is reported to
    * stderr under `tag`, never silently ignored.
    */
  def selectedQueries(tag: String): Map[String, (SparkSession, String) => DataFrame] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // blank value == unset
    only.foreach(_.diff(queries.keySet).foreach(n =>
      System.err.println(s"[$tag] SPARK_GRAFT_ONLY entry matches no query: $n")))
    only match {
      case Some(names) => queries.view.filterKeys(names).toMap
      case None        => queries
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.RefQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.DedupQueries.oracle ++
      graft.queries.SimQueries.oracle ++
      graft.queries.StreamQueries.oracle ++
      graft.queries.MultimodalQueries.oracle ++
      graft.queries.OlapQueries.oracle ++
      graft.queries.GraphQueries.oracle
}
