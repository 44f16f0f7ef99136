package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan over the testdata tables plus
  * (when SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (the driver hash-compares values):
  *  - every double output is either raw data, a single deterministic
  *    float op on raw data, or exact decimal arithmetic cast back to
  *    double — never an order-dependent double aggregate;
  *  - timestamps are emitted as epoch longs or formatted strings, never
  *    raw TIMESTAMP columns (parquet tz-annotation differences);
  *  - every query ends in a total ORDER BY mirrored in the oracle.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
