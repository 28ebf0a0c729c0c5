package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** PII redaction for compliance-safe analytics exports: mask contact fields
  * so downstream consumers see shape-preserving, join-safe surrogates, never
  * raw identifiers. The testdata customer table carries no contact columns,
  * so deterministic phone/email columns are synthesized from the keys first
  * (identically in the DuckDB oracle — byte-exact cross-engine input), then
  * redacted; the masking expressions are the real operator.
  *
  * Masking rules: phones keep the last 4 digits (every digit before them
  * becomes '#', separators survive so the format stays recognizable);
  * emails keep the first character and the full domain, starring the rest
  * of the local part. All row-local `functions._` expressions — fully
  * codegen'd, zero shuffles, predicate-free scan.
  */
object Redact {

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .selectExpr(
        "c_custkey",
        "'555-' || lpad(CAST(c_custkey * 7 % 10000 AS STRING), 4, '0') || " +
          "'-' || lpad(CAST(c_custkey * 13 % 10000 AS STRING), 4, '0') AS phone",
        "replace(lower(c_name), '#', '.') || '@example.com' AS email")
      .selectExpr(
        "c_custkey",
        "regexp_replace(substr(phone, 1, length(phone) - 4), '[0-9]', '#') " +
          "|| substr(phone, length(phone) - 3) AS phone_masked",
        "substr(email, 1, 1) || repeat('*', instr(email, '@') - 2) " +
          "|| substr(email, instr(email, '@')) AS email_masked",
        "CAST(length(regexp_replace(substr(phone, 1, length(phone) - 4), " +
          "'[^0-9]', '')) AS BIGINT) AS n_digits_masked")
}
