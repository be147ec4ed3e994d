package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named Spark query over the test star
  * schema plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * The driver's correctness gate sorts columns by NAME before hashing, so
  * every computed column is aliased identically in the Spark plan and the
  * oracle SQL. Numeric discipline for hash parity:
  *   - never SUM/AVG raw doubles (FP addition is order-dependent across
  *     engines); money math is cast to exact DECIMAL first, then the final
  *     aggregate is cast back to DOUBLE (same value in both engines);
  *   - computed integers are cast to LongType (DuckDB's year()/count()/
  *     row_number() are all BIGINT);
  *   - per-row double arithmetic (a*b, a/b) is IEEE-deterministic and safe.
  */
final case class QueryDef(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, doc: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, run, Some(oracle))

  /** For ops whose semantics aren't ANSI-SQL-expressible (driver records a
    * weaker rows-only check). */
  def rowsOnly(name: String, doc: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, run, None)
}
