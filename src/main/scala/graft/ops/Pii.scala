package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing stage of a
  * training-data pipeline (emails, IPv4 addresses, phone numbers).
  *
  * Patterns are restricted to constructs Java regex and RE2 (the
  * oracle's engine) execute identically: character classes, bounded
  * repetition, no lookaround, no backreferences. Detection counts
  * matches per category; redaction replaces every match with a typed
  * placeholder, email → ip → phone, in a fixed order so categories
  * cannot partially consume each other's matches.
  *
  * Scale shape: pure per-row expressions in one scan — embarrassingly
  * parallel, no shuffle at all (the ideal 100 TB operator).
  */
object Pii {

  val EmailRe = "[a-z0-9._]+@[a-z0-9-]+(\\.[a-z0-9-]+)+"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  private def count(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Redacted text: every match replaced by its typed placeholder.
    * Emails first (an email's host part would otherwise be eligible
    * for partial matches), then IPs, then phones. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document PII stats + the fully redacted text:
    * (doc_id, n_emails, n_ips, n_phones, redacted). */
  def piiStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("doc_id"),
        count(col(textCol), EmailRe).as("n_emails"),
        count(col(textCol), Ipv4Re).as("n_ips"),
        count(col(textCol), PhoneRe).as("n_phones"),
        redact(col(textCol)).as("redacted"))
      .orderBy("doc_id")

  /** Deterministic PII-bearing corpus for the oracle-checked query:
    * appends to each document 0–2 emails (doc_id mod 3), an IPv4 when
    * doc_id is even, and a phone number when doc_id % 5 == 0 — every
    * payload a pure function of doc_id, independently re-derivable in
    * SQL (the fixture corpus itself contains no PII, which would make
    * an all-zero detector pass vacuously). */
  def synthPii(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val id = col(idCol)
    val e1 = when(id % 3 >= 1,
      concat(lit(" mail user"), id, lit("a@mail.example.com")))
      .otherwise("")
    val e2 = when(id % 3 === 2,
      concat(lit(" cc user"), id, lit("b@mail.example.com")))
      .otherwise("")
    val ip = when(id % 2 === 0,
      concat(lit(" from 10."), id % 200, lit(".0."), id % 250 + 1))
      .otherwise("")
    val ph = when(id % 5 === 0,
      concat(lit(" call +1-555-"),
        lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((id % 10000).cast("string"), 4, "0")))
      .otherwise("")
    df.withColumn(textCol,
      concat(col(textCol), e1, e2, ip, ph))
  }
}
