package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query exposed through [[SparkEntry]].
  *
  * @param name   stable query key (driver correctness/bench key)
  * @param run    (spark, sfDir) => result DataFrame; deterministic
  * @param oracle equivalent DuckDB SQL over the same parquet tables,
  *               with IDENTICAL column names/types and a total ordering;
  *               None for ops not expressible in SQL (driver then does a
  *               weaker rows-only check)
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object GraftQuery {
  def queryMap(qs: Seq[GraftQuery]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.run).toMap

  def oracleMap(qs: Seq[GraftQuery]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
