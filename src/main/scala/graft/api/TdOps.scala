package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Blaze timedelta accessor namespace (`blaze/expr/datetime.py:369-383`),
  * over a timedelta expressed as MICROSECONDS (the value produced by
  * `DtOps.sub` — timestamp minus timestamp).
  *
  * Component semantics are pandas': `days` floors (negative deltas go
  * down), `seconds` / `microseconds` are the non-negative remainders
  * within the day / second, and `totalSeconds` is the exact float64
  * duration. Everything is codegen'd arithmetic — no UDFs.
  */
final class TdOps(private val us: Column) extends AnyVal {
  private def flDiv(a: Column, b: Long): Column =
    floor(a.cast(DoubleType) / b.toDouble).cast(LongType)

  /** whole days, floored (pandas `.days`). */
  def days: Column = flDiv(us, TdOps.UsPerDay)
  /** seconds within the day, 0..86399 (pandas `.seconds`). */
  def seconds: Column =
    flDiv(us - days * TdOps.UsPerDay, TdOps.UsPerSecond)
  /** microseconds within the second, 0..999999 (pandas `.microseconds`). */
  def microseconds: Column =
    us - days * TdOps.UsPerDay - seconds * TdOps.UsPerSecond
  /** exact float64 duration in seconds (pandas `.total_seconds()`). */
  def totalSeconds: Column = us.cast(DoubleType) / TdOps.UsPerSecond.toDouble
}

object TdOps {
  val UsPerSecond = 1000000L
  val UsPerDay = 86400000000L
}
