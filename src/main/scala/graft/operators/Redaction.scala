package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII redaction — the scrub stage every public-web training corpus
  * runs before anything else sees the text (emails, IPv4s, long digit
  * runs that cover phone/account numbers). All-regexp, so the whole
  * stage is one codegen'd projection over the corpus scan: no UDF, no
  * shuffle, no driver involvement — at 100 TB this is a pure map over
  * however many partitions the scan produces.
  *
  * Pattern dialect is the RE2-safe subset (no lookarounds, no
  * backreferences), deliberately: Spark compiles java.util.regex,
  * DuckDB compiles RE2, and these classes behave identically on the
  * shared subset — which is what makes the DuckDB oracle a real
  * cross-engine check of the scrub rather than a tautology.
  *
  * Replacement order matters and is fixed: emails first (their local
  * part may contain digits that would otherwise feed the digit-run
  * pattern), then IPv4s (dotted digit runs), then remaining long digit
  * runs on the already-redacted text. Counts are taken on the same
  * intermediate the corresponding replace sees, so
  * n_emails/n_ipv4/n_digit_runs always agree with what the output text
  * had removed.
  */
object Redaction {

  /** RE2+Java-shared email shape (practical scrub, not RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad with word boundaries; over-matches 999.9.9.9 like
    * every production scrubber — redacting too much beats leaking. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** 8+ digit-bearing runs with phone punctuation (space dash paren
    * plus) anchored on digits at both ends. */
  val DigitRunRe = "[0-9][0-9 ()+-]{6,}[0-9]"

  /** Per-document scrub report + redacted-text fingerprint: the md5
    * makes the oracle compare the full transformed text without
    * shipping it twice. Schema:
    * (doc_id, n_emails, n_ipv4, n_digit_runs, redacted_md5).
    */
  def redactDocuments(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("t1", regexp_replace(col("text"), EmailRe, "<EMAIL>"))
      .withColumn("t2", regexp_replace(col("t1"), Ipv4Re, "<IP>"))
      .withColumn("t3", regexp_replace(col("t2"), DigitRunRe, "<NUM>"))
    d.select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("t1"), lit(Ipv4Re)).as("n_ipv4"),
        regexp_count(col("t2"), lit(DigitRunRe)).as("n_digit_runs"),
        md5(col("t3")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }
}
