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

  /** #364 PII exposure audit per crawl source — the governance gate run
    * BEFORE a corpus ships: per source, documents containing an email or
    * a phone-shaped string, total hit counts, and the exposure rate in
    * basis points. Zero rows-with-hits is the desired production readout;
    * the spec plants positives to prove the detectors. Patterns stay in
    * the RE2∩Java-regex common dialect (character classes + bounded
    * quantifiers, no lookaround) — same portability rule as
    * [[graft.operators.Text.mojibakeAudit]]'s char class.
    *
    * Row-local regexp_extract_all counts + one source-sized aggregate;
    * complements [[piiRedact]] (masking) with MEASUREMENT — the audit
    * says whether there is anything left to redact.
    */
  def piiAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("source",
        "CAST(size(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}', 0)) AS BIGINT) AS n_email",
        "CAST(size(regexp_extract_all(text, '[0-9]{3}-[0-9]{3,4}-[0-9]{4}', 0)) AS BIGINT) AS n_phone")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum("n_email").as("email_hits"),
        org.apache.spark.sql.functions.sum("n_phone").as("phone_hits"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "CASE WHEN n_email > 0 OR n_phone > 0 THEN 1 ELSE 0 END")).as("n_exposed"))
      .selectExpr("source", "n_docs", "email_hits", "phone_hits", "n_exposed",
        "n_exposed * 10000 DIV n_docs AS exposure_bp")
}
