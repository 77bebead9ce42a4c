package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle statement over the same parquet tables.
  *
  * Parity rules used throughout the catalog (see graft.core.Num):
  *  - every order-dependent double reduction goes through a fixed-scale
  *    decimal cast on BOTH sides (bit-exact, order-independent);
  *  - every output is totally ordered by a deterministic key, with explicit
  *    NULLS FIRST in the oracle (DuckDB defaults to NULLS LAST, Spark to
  *    NULLS FIRST);
  *  - denominators are guarded on both sides (Spark doubles are IEEE —
  *    x/0 = Inf — while DuckDB yields NULL);
  *  - integer-producing oracle functions are cast to Spark's result type
  *    (DuckDB length()/year() return BIGINT where Spark returns INT).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
