package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality validation gates — the admission checks a training
  * pipeline runs before a new dump joins the corpus (and the
  * engine-side analogue of the reference's construction-time schema
  * checks, e.g. join key promotion `expr/collections.py:753-762`, sort
  * key validation `collections.py:162-172` — extended from schema to
  * DATA). Each check returns a `(rule, n_violations)` table so gates
  * compose by union and alert thresholds stay declarative.
  *
  * Scale shapes:
  *  - [[checkRules]]: ALL row-level predicates fold into ONE
  *    conditional aggregate over a single scan — adding a rule adds a
  *    codegen'd counter, never a pass.
  *  - [[checkUnique]]: one (keys → count) partial/final aggregate;
  *    violations = rows carrying a key seen more than once.
  *  - [[checkForeignKey]]: dangling references via a join on the key —
  *    broadcast when the dimension is small, the usual shuffle
  *    co-location tools otherwise.
  */
object Validate {

  /** Row-level predicate rules, one scan for all of them. A NULL
    * predicate result counts as a VIOLATION (the conservative gate:
    * "not provably valid"), mirroring SQL constraint semantics is
    * explicitly NOT wanted here — a crawl gate must flag unknowns. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules: at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "checkRules: duplicate rule names")
    val counters = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name)
    }
    val one = df.agg(counters.head, counters.tail: _*)
    val pairs = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), coalesce(col(name), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(pairs: _*)).as("_r")).select("_r.rule", "_r.n_violations")
  }

  /** Key-uniqueness check: `n_violations` = number of ROWS whose key
    * occurs more than once (so two copies of one key count 2 — the
    * rows you would have to quarantine). */
  def checkUnique(df: DataFrame, keys: Seq[String], rule: String = ""): DataFrame = {
    require(keys.nonEmpty, "checkUnique: at least one key column")
    val name = if (rule.nonEmpty) rule else s"unique(${keys.mkString(",")})"
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum(when(col("_c") > 1, col("_c")).otherwise(0L)), lit(0L))
        .as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }

  /** Referential-integrity check: `n_violations` = fact rows whose
    * `fkCol` has no match in `dim(dimKey)` (NULL FKs excluded — add a
    * [[checkRules]] not-null rule when NULLs are themselves invalid). */
  def checkForeignKey(fact: DataFrame, fkCol: String, dim: DataFrame,
                      dimKey: String, rule: String = "",
                      broadcastDim: Boolean = true): DataFrame = {
    val name = if (rule.nonEmpty) rule else s"fk($fkCol->$dimKey)"
    val keys0 = dim.select(col(dimKey).as(fkCol)).distinct()
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    fact.filter(col(fkCol).isNotNull)
      .join(keys, Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }
}
