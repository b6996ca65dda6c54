package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Blaze `.str` namespace (`blaze/expr/strings.py`), lowered to codegen'd
  * Spark built-ins. Semantics notes per method cite the reference.
  */
final class StrOps(private val c: Column) extends AnyVal {
  /** Blaze Like uses glob wildcards `*`/`?` translated to SQL `%`/`_`
    * (`strings.py:57-83`, `compute/sql.py:1276-1278`).
    */
  def like(globPattern: String): Column =
    c.like(StrOps.globToSql(globPattern))

  /** char length (`strings.py:93-94`). */
  def len: Column = length(c)

  def upper: Column = org.apache.spark.sql.functions.upper(c)
  def lower: Column = org.apache.spark.sql.functions.lower(c)
  /** pandas capitalize: first char upper, REST lower (`strings.py:171-175`). */
  def capitalize: Column =
    concat(org.apache.spark.sql.functions.upper(substring(c, 1, 1)),
           org.apache.spark.sql.functions.lower(expr_substr(c, 2)))

  def strip: Column = trim(c)
  def lstrip: Column = ltrim(c)
  def rstrip: Column = rtrim(c)

  // --- predicates (`strings.py:111-126`) — regex formulas, no UDFs ---
  def isalnum: Column = c.rlike("^[A-Za-z0-9]+$")
  def isalpha: Column = c.rlike("^[A-Za-z]+$")
  def isdecimal: Column = c.rlike("^[0-9]+$")
  def isdigit: Column = c.rlike("^[0-9]+$")
  def islower: Column = c.rlike("[a-z]") && !c.rlike("[A-Z]")
  def isnumeric: Column = c.rlike("^[0-9]+$")
  def isspace: Column = c.rlike("^\\s+$")
  def istitle: Column = // every alpha-run starts upper then stays lower
    c.rlike("[A-Za-z]") && !c.rlike("(^|[^A-Za-z])[a-z]") && !c.rlike("[A-Za-z][A-Z]")
  def isupper: Column = c.rlike("[A-Z]") && !c.rlike("[a-z]")

  /** pandas str.find: 0-based, -1 when absent (`strings.py:128-142`);
    * SQL backend uses 1-based position (`compute/sql.py:1324-1327`).
    */
  def find(sub: String): Column = (instr(c, sub) - 1).cast(LongType)

  /** Replace(old, new) (`strings.py:144-155`). */
  def replace(oldSub: String, newSub: String): Column =
    org.apache.spark.sql.functions.replace(c, lit(oldSub), lit(newSub))

  /** Replace(old, new, max) (`strings.py:144-155`; pandas-only in the
    * reference, `compute/pandas.py:308-310`): replace the FIRST `max`
    * non-overlapping occurrences, Python `str.replace(old, new, count)`
    * semantics. Lowered to `split(limit = max+1)` + `array_join` — with a
    * positive limit Java split keeps the unsplit tail (separators
    * included) in the last element, so rejoining with `new` replaces
    * exactly the first `max` occurrences. Codegen'd, no UDF.
    */
  def replace(oldSub: String, newSub: String, max: Int): Column = {
    require(oldSub.nonEmpty, "replace: old substring must be non-empty")
    require(max > 0, "replace: max must be positive (omit it to replace all)")
    array_join(
      split(c, java.util.regex.Pattern.quote(oldSub), max + 1), newSub)
  }

  /** Pad(width, side, fillchar) (`strings.py:157-169`).
    * left/right lower to SQL LPAD/RPAD (which TRUNCATE strings longer
    * than `width` — the reference SQL backend's semantics). `both` has no
    * SQL analogue, so it follows pandas `str.center` exactly instead:
    * longer strings pass through UNCHANGED, and the left margin is
    * CPython's `marg//2 + (marg & width & 1)` (the quirk that sends the
    * odd fill char LEFT when width is odd — `'ab'.center(5)` = `'  ab '`).
    */
  def pad(width: Int, side: String = "left", fillchar: String = " "): Column =
    side match {
      case "left"  => lpad(c, width, fillchar)
      case "right" => rpad(c, width, fillchar)
      case "both" =>
        val marg = greatest(lit(width) - length(c), lit(0))
        val leftPad = (marg / 2).cast(IntegerType) +
          marg.cast(IntegerType).bitwiseAND(lit(width)).bitwiseAND(lit(1))
        when(length(c) >= width, c)
          .otherwise(rpad(lpad(c, (length(c) + leftPad).cast(IntegerType), lit(fillchar)),
            width, fillchar))
      case other => throw new IllegalArgumentException(
        s"Pad side must be left/right/both, got $other")
    }

  /** `.str[a:b]` — 0-based half-open slice; SQL backend forbids step and
    * negatives (`strings.py:195-220`, `compute/sql.py:1297-1321`).
    */
  def slice(start: Int, stop: Int): Column = {
    require(start >= 0 && stop >= start, "str slice: 0<=start<=stop, no step/negatives")
    substring(c, start + 1, stop - start)
  }
  def sliceFrom(start: Int): Column = expr_substr(c, start + 1)

  /** SliceReplace (`strings.py:202-213`). */
  def sliceReplace(start: Int, stop: Int, repl: String): Column =
    concat(substring(c, 1, start), lit(repl), expr_substr(c, stop + 1))

  /** StrCat: null-propagating concat with optional sep (`strings.py:222-288`);
    * matches pandas `na_rep=None`: any null side → null.
    */
  def cat(other: Column, sep: String = ""): Column =
    if (sep.isEmpty) concat(c, other) else concat(c, lit(sep), other)

  /** string * int (`arithmetic.py:147-163`). */
  def repeat(n: Int): Column = org.apache.spark.sql.functions.repeat(c, n)

  private def expr_substr(col: Column, pos: Int): Column =
    substring(col, pos, Int.MaxValue)
}

object StrOps {
  /** glob → SQL LIKE translation (`compute/sql.py:1276-1278`). */
  def globToSql(glob: String): String =
    glob.replace("%", "\\%").replace("_", "\\_").replace('*', '%').replace('?', '_')
}
