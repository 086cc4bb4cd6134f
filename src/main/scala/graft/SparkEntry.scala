package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Functions, Graph, Ingest, Lake, Llm, Pipeline, Relational, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each operator key in `queries` has, where SQL-expressible, an
  * equivalent DuckDB oracle in `oracleSql` (same column names, same total
  * ordering — the driver hash-compares sorted-by-name columns). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary: scan→filter→project→agg→sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Functions.queries ++ Llm.queries ++
      Streaming.queries ++ Ingest.queries ++ Pipeline.queries ++
      Lake.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate / streaming / binary) → driver records rows-only. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Functions.oracles ++ Llm.oracles ++
      Streaming.oracles ++ Ingest.oracles ++ Pipeline.oracles ++
      Lake.oracles ++ Graph.oracles
}
