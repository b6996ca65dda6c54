package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Blaze `Expr` column surface re-expressed over Spark `Column`.
  *
  * Mirrors the scalar operator algebra of the reference
  * (`blaze/expr/arithmetic.py`, `math.py`, `strings.py`, `datetime.py`)
  * with its semantics quirks encoded here once:
  *   - `Div` is always float64 (`arithmetic.py:189-196`)
  *   - `FloorDiv` floors then returns integral type (`arithmetic.py:199-210`)
  *   - comparison/boolean ops are null-aware (`arithmetic.py:345-389`)
  *   - `.str` / `.dt` method namespaces (`strings.py:300-328`,
  *     `datetime.py:399-408`)
  *
  * Everything lowers to built-in `org.apache.spark.sql.functions` so the
  * whole expression stays inside whole-stage codegen — the Spark analogue
  * of Blaze's `Broadcast` fusion (`expr/broadcast.py`), which we get for
  * free and therefore do not reimplement.
  */
final case class Col(c: Column) {
  // --- arithmetic (blaze/expr/arithmetic.py) ---
  def +(o: Col): Col = Col(c + o.c)
  def -(o: Col): Col = Col(c - o.c)
  def *(o: Col): Col = Col(c * o.c)
  /** Blaze Div: result is always float64 regardless of input dtypes. */
  def /(o: Col): Col = Col(c.cast(DoubleType) / o.c.cast(DoubleType))
  /** Blaze FloorDiv: floor of true division, kept integral for int inputs. */
  def floorDiv(o: Col): Col = Col(floor(c.cast(DoubleType) / o.c.cast(DoubleType)).cast(LongType))
  def %(o: Col): Col = Col(c % o.c)
  def pow(o: Col): Col = Col(org.apache.spark.sql.functions.pow(c, o.c))
  def unary_- : Col = Col(negate(c))

  def +(v: Any): Col = this + Col.lit0(v)
  def -(v: Any): Col = this - Col.lit0(v)
  def *(v: Any): Col = this * Col.lit0(v)
  def /(v: Any): Col = this / Col.lit0(v)
  def %(v: Any): Col = this % Col.lit0(v)

  // --- comparison (null-aware, ?bool) ---
  def ===(o: Col): Col = Col(c === o.c)
  def !==(o: Col): Col = Col(c =!= o.c)
  def <(o: Col): Col = Col(c < o.c)
  def <=(o: Col): Col = Col(c <= o.c)
  def >(o: Col): Col = Col(c > o.c)
  def >=(o: Col): Col = Col(c >= o.c)
  def ===(v: Any): Col = Col(c === v)
  def !==(v: Any): Col = Col(c =!= v)
  def <(v: Any): Col = Col(c < v)
  def <=(v: Any): Col = Col(c <= v)
  def >(v: Any): Col = Col(c > v)
  def >=(v: Any): Col = Col(c >= v)

  // --- boolean ---
  def &&(o: Col): Col = Col(c && o.c)
  def ||(o: Col): Col = Col(c || o.c)
  def unary_! : Col = Col(!c)

  // --- naming / casting (expressions.py Label / Coerce / Cast) ---
  def label(name: String): Col = Col(c.as(name))
  def as(name: String): Col = label(name)
  /** Blaze `.coerce(typ)` — runtime cast (`expressions.py:794-818`). */
  def coerce(typ: String): Col = Col(c.cast(typ))
  def cast(dt: DataType): Col = Col(c.cast(dt))
  /** Blaze `Cast` — COMPILE-TIME schema re-declaration, no runtime
    * conversion (`expressions.py:821-853`). Spark types are already
    * carried by the plan, so this is the documented no-op; use
    * [[coerce]] to actually convert values.
    */
  def retag(typ: String): Col = { val _ = typ; this }

  // --- null handling ---
  def isNull: Col = Col(c.isNull)
  /** Blaze `notnull` (`math.py:106-120`). */
  def notnull: Col = Col(c.isNotNull)
  def isNaN: Col = Col(isnan(c))
  def coalesceWith(os: Col*): Col =
    Col(org.apache.spark.sql.functions.coalesce((c +: os.map(_.c)): _*))

  // --- membership (collections.py IsIn) ---
  def isin(vs: Any*): Col = Col(c.isin(vs: _*))

  // --- reductions as methods (reductions.py) ---
  def sum: Col = Col(org.apache.spark.sql.functions.sum(c))
  def min: Col = Col(org.apache.spark.sql.functions.min(c))
  def max: Col = Col(org.apache.spark.sql.functions.max(c))
  /** Blaze mean → float64. */
  def mean: Col = Col(avg(c))
  def count: Col = Col(org.apache.spark.sql.functions.count(c))
  /** Exact distinct count (`reductions.py:200-201`) — NOT approximate. */
  def nunique: Col = Col(countDistinct(c))
  /** HLL++ approximate distinct count — the 100 TB alternative when the
    * distinct set itself won't fit a shuffle partition. Extension beyond
    * the reference (its nunique is exact-only); rsd = relative error.
    */
  def nuniqueApprox(rsd: Double = 0.05): Col = Col(approx_count_distinct(c, rsd))
  /** Approximate percentile (t-digest-style sketch) — the 100 TB scale
    * path next to the exact interpolated `percentile` the oracle-checked
    * queries use (exact percentile buffers per-group values; the sketch
    * is bounded-memory). Extension beyond the reference.
    */
  def quantileApprox(p: Double, accuracy: Int = 10000): Col =
    Col(percentile_approx(c, lit(p), lit(accuracy)))
  def any: Col = Col(org.apache.spark.sql.functions.max(c.cast(BooleanType)))
  def all: Col = Col(org.apache.spark.sql.functions.min(c.cast(BooleanType)))
  /** var with ddof: unbiased=true → sample variance (`reductions.py:142-191`). */
  def variance(unbiased: Boolean = true): Col =
    Col(if (unbiased) var_samp(c) else var_pop(c))
  def std(unbiased: Boolean = true): Col =
    Col(if (unbiased) stddev_samp(c) else stddev_pop(c))
  /** vnorm(ord) = (sum |x|^ord)^(1/ord) (`reductions.py:299-314`). */
  def vnorm(ord: Int = 2): Col = Col(
    org.apache.spark.sql.functions.pow(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.pow(abs(c), ord.toDouble)),
      1.0 / ord))

  // --- namespaces ---
  def str: StrOps = new StrOps(c)
  def dt: DtOps = new DtOps(c)
  /** timedelta accessors over a µs-difference column (see [[DtOps.sub]]). */
  def td: TdOps = new TdOps(c)
  def math: MathOps = new MathOps(c)
}

object Col {
  private[api] def lit0(v: Any): Col = v match {
    case col: Col    => col
    case col: Column => Col(col)
    case other       => Col(org.apache.spark.sql.functions.lit(other))
  }
  def lit(v: Any): Col = lit0(v)
}
