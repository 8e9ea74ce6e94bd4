package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Kept top-level so each domain module (SEC pipeline, LLM ops,
  * events, ingest) can declare its own `Seq[Q]` next to the operators it
  * exercises. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
