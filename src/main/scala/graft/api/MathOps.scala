package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Blaze math scalar functions (`blaze/expr/math.py:35-135`) — all lowered
  * to codegen'd built-ins; `copysign`/`ldexp`/`truncate` are expression
  * combos (no UDFs), matching `compute/sql.py:408-434`.
  */
final class MathOps(private val c: Column) extends AnyVal {
  def abs: Column = org.apache.spark.sql.functions.abs(c)
  def sqrt: Column = org.apache.spark.sql.functions.sqrt(c)
  def sin: Column = org.apache.spark.sql.functions.sin(c)
  def sinh: Column = org.apache.spark.sql.functions.sinh(c)
  def cos: Column = org.apache.spark.sql.functions.cos(c)
  def cosh: Column = org.apache.spark.sql.functions.cosh(c)
  def tan: Column = org.apache.spark.sql.functions.tan(c)
  def tanh: Column = org.apache.spark.sql.functions.tanh(c)
  def exp: Column = org.apache.spark.sql.functions.exp(c)
  def expm1: Column = org.apache.spark.sql.functions.expm1(c)
  def log: Column = org.apache.spark.sql.functions.log(c)
  def log10: Column = org.apache.spark.sql.functions.log10(c)
  def log1p: Column = org.apache.spark.sql.functions.log1p(c)
  def acos: Column = org.apache.spark.sql.functions.acos(c)
  def acosh: Column = org.apache.spark.sql.functions.acosh(c)
  def asin: Column = org.apache.spark.sql.functions.asin(c)
  def asinh: Column = org.apache.spark.sql.functions.asinh(c)
  def atan: Column = org.apache.spark.sql.functions.atan(c)
  def atanh: Column = org.apache.spark.sql.functions.atanh(c)
  def radians: Column = org.apache.spark.sql.functions.radians(c)
  def degrees: Column = org.apache.spark.sql.functions.degrees(c)
  def ceil: Column = org.apache.spark.sql.functions.ceil(c)
  def floor: Column = org.apache.spark.sql.functions.floor(c)
  /** trunc toward zero (`math.py:92-99`). */
  def trunc: Column =
    when(c >= 0, org.apache.spark.sql.functions.floor(c))
      .otherwise(org.apache.spark.sql.functions.ceil(c))
  def atan2(o: Column): Column = org.apache.spark.sql.functions.atan2(c, o)
  def hypot(o: Column): Column = org.apache.spark.sql.functions.hypot(c, o)
  /** copysign: |x| with sign of y — expression combo (`math.py:64-73`). */
  def copysign(o: Column): Column =
    when(o >= 0 || o.isNaN, org.apache.spark.sql.functions.abs(c))
      .otherwise(-org.apache.spark.sql.functions.abs(c))
  /** fmod: C-style remainder = Spark `%` on doubles. */
  def fmod(o: Column): Column = c.cast(DoubleType) % o.cast(DoubleType)
  /** ldexp: x * 2^i (`math.py:64-73`). */
  def ldexp(i: Column): Column =
    c.cast(DoubleType) * org.apache.spark.sql.functions.pow(lit(2.0), i)
  def isnan: Column = org.apache.spark.sql.functions.isnan(c)
  /** Blaze truncate(x, prec) = x // prec * prec (`math.py:123-135`). */
  def truncate(precision: Double): Column =
    org.apache.spark.sql.functions.floor(c.cast(DoubleType) / precision) * precision
  def greatest(o: Column): Column = org.apache.spark.sql.functions.greatest(c, o)
  def least(o: Column): Column = org.apache.spark.sql.functions.least(c, o)
}
