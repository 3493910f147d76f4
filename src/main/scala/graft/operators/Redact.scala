package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for corpus curation: replace emails / IPv4 addresses /
  * dashed phone numbers with typed placeholder tokens and count what was
  * redacted — the scrubbing pass before text enters a training corpus.
  *
  * Pure regexp Column expressions: a narrow per-row map, zero shuffle,
  * fully codegen'd. The patterns deliberately avoid backtracking-only
  * regex features (backreferences, lookaround) so Java regex (Spark) and
  * RE2 (DuckDB and most scanners) agree on every match — the property
  * that makes the oracle gate possible and keeps behavior identical when
  * the same patterns run in sidecar tooling.
  *
  * Counts are measured on the ORIGINAL text per category (overlapping
  * categories each count; the replacement pass applies email → ipv4 →
  * phone in that fixed order).
  */
object Redact {

  val emailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern: String = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

  private val patterns = Seq(
    ("email", emailPattern, "<EMAIL>"),
    ("ipv4", ipv4Pattern, "<IP>"),
    ("phone", phonePattern, "<PHONE>"))

  /** Redacted text: all three categories replaced by their tokens. */
  def redactText(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Adds `red_text` plus per-category counts (`n_email`, `n_ipv4`,
    * `n_phone`) measured on the original text.
    */
  /** Salted pseudonymization of identifier columns: each named column is
    * replaced by sha256(salt || value) — referentially consistent (the
    * same id maps to the same token everywhere, so joins and group-bys
    * still line up) but not reversible without the salt. The compliance
    * counterpart of [[redactText]]: redaction destroys spans inside free
    * text, pseudonymization preserves the RELATIONAL structure of key
    * columns. Pure per-row Columns, zero shuffle; null ids stay null
    * (sha2 of a null concat is null — a null key must not collapse to
    * one sentinel token shared across rows).
    */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      salt: String): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        sha2(concat(lit(salt), col(c).cast("string")), 256))
    }
  }

  /** Per-group PII exposure report: for each group, how many documents
    * contain each PII category and the total match counts — the "is
    * this feed PII-heavy enough to need scrubbing review" triage run
    * BEFORE [[withRedactions]] rewrites anything. One row per group:
    * (group, n_docs, docs_email, n_email, docs_ipv4, n_ipv4,
    * docs_phone, n_phone). Null groups/texts are excluded.
    *
    * 100 TB shape: the same codegen'd regexp counts as
    * [[withRedactions]], folded into ONE map-side-combinable agg —
    * groups-sized output, single shuffle, text never moves.
    */
  def piiStats(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    def hits(pat: String): Column =
      size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
    val cats = patterns.map { case (name, pat, _) => (name, hits(pat)) }
    df.filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        cats.flatMap { case (name, h) => Seq(
          sum(when(h > 0, 1L).otherwise(0L)).as(s"docs_$name"),
          sum(h.cast("long")).as(s"n_$name"))
        }: _*)
  }

  def withRedactions(df: DataFrame, textCol: String): DataFrame =
    patterns.foldLeft(
      df.withColumn("red_text", redactText(col(textCol)))) {
      case (d, (name, pat, _)) =>
        d.withColumn(s"n_$name",
          size(regexp_extract_all(col(textCol), lit(pat), lit(0))))
    }
}
