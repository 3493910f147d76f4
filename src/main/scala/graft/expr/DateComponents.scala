package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date-partition component derivation with failure sentinels.
  *
  * Semantics from the reference
  * (reference: src/main/scala/com/adidas/analytics/algo/shared/DateComponentDerivation.scala:17-149):
  * a source column holding a formatted date string/int is expanded into
  * partition components `year / month / day / week`; any unparsable value
  * maps to the sentinels 9999 (year) / 99 (month, day, week). Week means
  * ALIGNED_WEEK_OF_YEAR = ((dayOfYear - 1) / 7) + 1 — NOT ISO week
  * (Spark's `weekofyear` is ISO, so it is deliberately not used here).
  * Supported formats (reference CustomDateFormatters.scala:9-49):
  * yyyyMMdd, yyyy-MM-dd, MM/dd/yyyy, yyyyMM, yyyyww, yyyywwe,
  * yyyy-MM-dd HH:mm:ss.
  *
  * Unlike the reference (four Scala UDFs — codegen black boxes), these are
  * pure Column expressions: whole-stage codegen keeps working, constant
  * folding applies, and the derivation can be pushed below shuffles.
  */
object DateComponents {

  val SentinelYear = 9999
  val SentinelPart = 99

  /** Formats where a calendar day is identified (so day/week derivable). */
  private val dayFormats =
    Set("yyyyMMdd", "yyyy-MM-dd", "MM/dd/yyyy", "yyyy-MM-dd HH:mm:ss")

  /** Parse a formatted string column to a date, null on failure. */
  def parse(c: Column, format: String): Column = format match {
    case "yyyyMM" =>
      // to_date("200913","yyyyMM") would fail for month 13; validate by regex
      // then re-anchor to day 1 like the reference's MONTHLY formatter.
      when(c.rlike("^\\d{4}(0[1-9]|1[0-2])$"),
        to_date(concat(c, lit("01")), "yyyyMMdd"))
    case "yyyyww" | "yyyywwe" =>
      lit(null).cast("date") // week formats never yield a calendar date
    case f => try_to_date(c, f)
  }

  /** year component with 9999 sentinel. */
  def yearOf(c: Column, format: String): Column = format match {
    case "yyyyww" | "yyyywwe" =>
      val pat = if (format == "yyyyww") "^\\d{4}(0[1-9]|[1-4]\\d|5[0-3])$"
                else "^\\d{4}(0[1-9]|[1-4]\\d|5[0-3])[1-7]$"
      when(c.rlike(pat), substring(c, 1, 4).cast("int"))
        .otherwise(lit(SentinelYear)).cast("short")
    case f =>
      coalesce(year(parse(c, f)), lit(SentinelYear)).cast("short")
  }

  /** month component with 99 sentinel (undefined for week formats). */
  def monthOf(c: Column, format: String): Column = format match {
    case "yyyyww" | "yyyywwe" => lit(SentinelPart).cast("short")
    case f => coalesce(month(parse(c, f)), lit(SentinelPart)).cast("short")
  }

  /** day component: day-of-month for day formats, day-of-week digit for
    * yyyywwe (reference: `dd` vs `e` distinction), 99 otherwise.
    */
  def dayOf(c: Column, format: String): Column = format match {
    case "yyyywwe" =>
      when(c.rlike("^\\d{4}(0[1-9]|[1-4]\\d|5[0-3])[1-7]$"),
        substring(c, 7, 1).cast("int"))
        .otherwise(lit(SentinelPart)).cast("short")
    case f if dayFormats.contains(f) =>
      coalesce(dayofmonth(parse(c, f)), lit(SentinelPart)).cast("short")
    case _ => lit(SentinelPart).cast("short")
  }

  /** week component: ALIGNED_WEEK_OF_YEAR for day formats, the literal ww
    * digits for week formats, 99 sentinel otherwise.
    */
  def weekOf(c: Column, format: String): Column = format match {
    case "yyyyww" =>
      when(c.rlike("^\\d{4}(0[1-9]|[1-4]\\d|5[0-3])$"),
        substring(c, 5, 2).cast("int"))
        .otherwise(lit(SentinelPart)).cast("short")
    case "yyyywwe" =>
      when(c.rlike("^\\d{4}(0[1-9]|[1-4]\\d|5[0-3])[1-7]$"),
        substring(c, 5, 2).cast("int"))
        .otherwise(lit(SentinelPart)).cast("short")
    case f if dayFormats.contains(f) =>
      coalesce(((dayofyear(parse(c, f)) - 1) / 7).cast("int") + 1,
        lit(SentinelPart)).cast("short")
    case _ => lit(SentinelPart).cast("short")
  }

  /** Expand `sourceCol` (format `format`) into the requested target
    * partition components, appended as columns.
    */
  def withComponents(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      format: String, targets: Seq[String]): org.apache.spark.sql.DataFrame = {
    val c = col(sourceCol).cast("string")
    targets.foldLeft(df) { (d, t) =>
      t match {
        case "year"  => d.withColumn("year", yearOf(c, format))
        case "month" => d.withColumn("month", monthOf(c, format))
        case "day"   => d.withColumn("day", dayOf(c, format))
        case "week"  => d.withColumn("week", weekOf(c, format))
        case other => throw new IllegalArgumentException(
          s"unsupported target partition component: $other")
      }
    }
  }
}
