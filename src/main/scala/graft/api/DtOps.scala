package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Blaze `.dt` namespace (`blaze/expr/datetime.py`), lowered to Spark
  * built-ins. Convention traps encoded (and unit-tested):
  *   - `second` is float64 in Blaze (`datetime.py:101-102`)
  *   - `dayofweek`/`weekday` is Monday=0 (pandas convention; see the
  *     Sunday/Monday fix in `compute/sql.py:1408-1444`)
  *   - N-unit truncate is epoch arithmetic (`compute/pydatetime.py`),
  *     not just `date_trunc`
  */
final class DtOps(private val c: Column) extends AnyVal {
  def year: Column = org.apache.spark.sql.functions.year(c)
  def month: Column = org.apache.spark.sql.functions.month(c)
  def day: Column = dayofmonth(c)
  def hour: Column = org.apache.spark.sql.functions.hour(c)
  def minute: Column = org.apache.spark.sql.functions.minute(c)
  /** float64 per Blaze schema (`datetime.py:101-102`). */
  def second: Column = org.apache.spark.sql.functions.second(c).cast(DoubleType)
  def millisecond: Column = ((DtOps.us(c) % 1000000L) / 1000L).cast(LongType)
  def microsecond: Column = (DtOps.us(c) % 1000000L).cast(LongType)
  /** pandas `.nanosecond`: sub-microsecond component 0..999
    * (`datetime.py:77-83`). Spark timestamps are µs-precision, so this is
    * identically 0 — kept for surface parity (pandas also returns 0 for
    * µs-resolution data).
    */
  def nanosecond: Column = (DtOps.us(c) * 0L).cast(LongType)
  def date: Column = to_date(c)
  /** time-of-day as µs since midnight (`datetime.py:45-131` `time`
    * accessor; Spark has no TIME column type, so the canonical numeric
    * encoding is used — render with strftime for display).
    */
  def time: Column = pmod(DtOps.us(c), lit(86400000000L)).cast(LongType)

  /** timestamp difference in microseconds — the timedelta constructor;
    * chain with [[Col.td]] for component accessors (`datetime.py:369-383`).
    */
  def sub(other: Column): Column = DtOps.us(c) - DtOps.us(other)

  /** timestamp ± timedelta(µs) (`arithmetic.py:117-139` datetime/timedelta
    * promotion rules: datetime + timedelta → datetime).
    */
  def addUs(deltaUs: Column): Column = timestamp_micros(DtOps.us(c) + deltaUs)
  def subUs(deltaUs: Column): Column = timestamp_micros(DtOps.us(c) - deltaUs)

  def week: Column = weekofyear(c)
  def dayofyear: Column = org.apache.spark.sql.functions.dayofyear(c)
  /** Monday=0 .. Sunday=6 (pandas); Spark's dayofweek is Sunday=1..Saturday=7. */
  def weekday: Column = (org.apache.spark.sql.functions.dayofweek(c) + 5) % 7
  def weekdayName: Column = date_format(c, "EEEE")
  def daysinmonth: Column = dayofmonth(last_day(c))
  def quarter: Column = org.apache.spark.sql.functions.quarter(c)

  // NB: qualified functions.month — the 0-ary `month` member shadows it
  def isMonthStart: Column = dayofmonth(c) === 1
  def isMonthEnd: Column = to_date(c) === last_day(c)
  def isQuarterStart: Column =
    dayofmonth(c) === 1 && (org.apache.spark.sql.functions.month(c) % 3 === 1)
  def isQuarterEnd: Column =
    to_date(c) === last_day(c) && (org.apache.spark.sql.functions.month(c) % 3 === 0)
  def isYearStart: Column = org.apache.spark.sql.functions.dayofyear(c) === 1
  def isYearEnd: Column =
    org.apache.spark.sql.functions.month(c) === 12 && dayofmonth(c) === 31

  /** DateTimeTruncate(measure, unit) (`datetime.py:203-254`): truncate to a
    * multiple of N units, e.g. truncate(10, "minutes"). measure==1 lowers to
    * `date_trunc`; general N uses exact epoch arithmetic matching the
    * reference python backend (`compute/pydatetime.py`).
    */
  def truncate(measure: Int, unit: String): Column = {
    val u = DtOps.normalizeUnit(unit)
    if (measure == 1) date_trunc(u, c)
    else u match {
      case "millisecond" | "microsecond" =>
        val usPer = if (u == "millisecond") 1000L else 1L
        val w = usPer * measure
        timestamp_micros(floor(DtOps.us(c).cast(DoubleType) / w).cast(LongType) * w)
      case "second" | "minute" | "hour" | "day" =>
        val secsPer = Map("second" -> 1L, "minute" -> 60L,
          "hour" -> 3600L, "day" -> 86400L)(u)
        val w = secsPer * measure
        timestamp_seconds(floor(unix_timestamp(c).cast(DoubleType) / w).cast(LongType) * w)
      case "month" =>
        // NB: qualify functions.year/month — DtOps members shadow them
        val m0 = org.apache.spark.sql.functions.year(c) * 12 +
          org.apache.spark.sql.functions.month(c) - 1
        val mt = floor(m0.cast(DoubleType) / measure).cast(LongType) * measure
        make_date(floor(mt.cast(DoubleType) / 12).cast(IntegerType),
          (mt % 12).cast(IntegerType) + 1, lit(1)).cast(TimestampType)
      case "year" =>
        val yt = floor(org.apache.spark.sql.functions.year(c).cast(DoubleType) / measure)
          .cast(IntegerType) * measure
        make_date(yt.cast(IntegerType), lit(1), lit(1)).cast(TimestampType)
      case "week" =>
        // epoch day 0 = Thursday; pandas-style week truncation anchors Monday
        val d = (datediff(to_date(c), lit(java.sql.Date.valueOf("1970-01-05"))))
        val wd = floor(d.cast(DoubleType) / (7L * measure)).cast(LongType) * (7L * measure)
        date_add(lit(java.sql.Date.valueOf("1970-01-05")), wd.cast(IntegerType)).cast(TimestampType)
      case other => throw new IllegalArgumentException(s"truncate unit: $other")
    }
  }

  /** strftime (`datetime.py:150-152`) — C tokens translated to Spark's
    * java.time format (`date_format`).
    */
  def strftime(cFormat: String): Column = date_format(c, DtOps.strftimeToJava(cFormat))

  /** Round/Floor/Ceil(freq) — pandas-only in the reference
    * (`datetime.py:263-284`); epoch-arithmetic formulas here.
    */
  def floorFreq(seconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(c).cast(DoubleType) / seconds).cast(LongType) * seconds)
  def ceilFreq(seconds: Long): Column =
    timestamp_seconds(ceil(unix_timestamp(c).cast(DoubleType) / seconds).cast(LongType) * seconds)
  def roundFreq(seconds: Long): Column = {
    val half = seconds / 2.0
    timestamp_seconds(
      floor((unix_timestamp(c).cast(DoubleType) + half) / seconds).cast(LongType) * seconds)
  }

  /** UTCFromTimestamp (`datetime.py:125-130`). */
  def utcFromTimestamp: Column = timestamp_seconds(c)
}

object DtOps {
  /** epoch microseconds, tolerant of TIMESTAMP_NTZ columns (parquet
    * timestamps without isAdjustedToUTC read as NTZ in Spark 4;
    * `unix_micros` only accepts TIMESTAMP, so cast first — identity on
    * the UTC wall clock under the UTC session timezone).
    */
  private[api] def us(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** unit normalization (`datetime.py:154-200`). Matched explicitly —
    * a generic strip-trailing-'s' would turn "ms" into "m" (month!), and
    * unknown units must fail loudly, not lower to a null-producing
    * date_trunc.
    */
  def normalizeUnit(unit: String): String = unit.toLowerCase match {
    case "y" | "yr" | "yrs" | "year" | "years"             => "year"
    case "q" | "quarter" | "quarters"                      => "quarter"
    case "mon" | "month" | "months"                        => "month"
    case "m" => "month" // blaze: bare 'm' is ambiguous; datashape uses month
    case "w" | "wk" | "wks" | "week" | "weeks"             => "week"
    case "d" | "day" | "days"                              => "day"
    case "h" | "hr" | "hrs" | "hour" | "hours"             => "hour"
    case "t" | "min" | "mins" | "minute" | "minutes"       => "minute"
    case "s" | "sec" | "secs" | "second" | "seconds"       => "second"
    case "ms" | "millisecond" | "milliseconds"             => "millisecond"
    case "us" | "microsecond" | "microseconds"             => "microsecond"
    case other =>
      throw new IllegalArgumentException(s"unknown datetime unit: $other")
  }

  /** C strftime tokens → java.time DateTimeFormatter pattern. */
  def strftimeToJava(f: String): String = {
    val sb = new StringBuilder
    var i = 0
    var literal = new StringBuilder
    def flush(): Unit = {
      if (literal.nonEmpty) { sb.append("'").append(literal.toString.replace("'", "''")).append("'"); literal.clear() }
    }
    while (i < f.length) {
      if (f.charAt(i) == '%' && i + 1 < f.length) {
        flush()
        f.charAt(i + 1) match {
          case 'Y' => sb.append("yyyy")
          case 'y' => sb.append("yy")
          case 'm' => sb.append("MM")
          case 'd' => sb.append("dd")
          case 'H' => sb.append("HH")
          case 'I' => sb.append("hh")
          case 'M' => sb.append("mm")
          case 'S' => sb.append("ss")
          case 'f' => sb.append("SSSSSS")
          case 'p' => sb.append("a")
          case 'A' => sb.append("EEEE")
          case 'a' => sb.append("EEE")
          case 'B' => sb.append("MMMM")
          case 'b' => sb.append("MMM")
          case 'j' => sb.append("DDD")
          case '%' => literal.append('%')
          case other => literal.append('%').append(other)
        }
        i += 2
      } else { literal.append(f.charAt(i)); i += 1 }
    }
    flush()
    sb.toString
  }
}
