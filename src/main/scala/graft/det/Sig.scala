package graft.det

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic float emission.
  *
  * Any statistic computed by floating-point aggregation (means, variances,
  * correlations, …) differs between Spark and the DuckDB oracle at the
  * ~1e-12 relative level (different summation orders / update formulas).
  * The driver hash-compares values, so both engines must emit *identical*
  * doubles. We round every computed float to 5 significant digits using the
  * *same* closed-form expression on both sides:
  *
  *   m = 10 ^ floor(log10(|x|));   sig5(x) = round(x / m, 5) * m
  *
  * The rounding bucket (1e-5 relative) is ~1e7 times wider than the
  * cross-engine divergence, so the probability of a boundary straddle is
  * negligible, and both Spark's `round` (BigDecimal HALF_UP) and DuckDB's
  * `round` (half away from zero) agree away from exact dyadic halves.
  *
  * Raw data values (min/max/sample values) and pure-integer-derived floats
  * are emitted unrounded: both engines compute them from identical operands
  * with identical IEEE-754 operations.
  */
object Sig {

  // NOTE 1: 10^e for NEGATIVE e is inexact and Java's Math.pow and C's
  // pow() disagree at the last ulp (observed: pow(10,-5) differs) — so
  // the scale factor is always computed as an exact positive power of
  // ten (exact integers in double up to 1e22) and inverted with one
  // IEEE division, which is correctly rounded and thus identical in
  // both engines.
  //
  // NOTE 2: low-entropy decimal data lands EXACTLY on rounding halves
  // (observed: avg of four 2-decimal values = 102.7575), where Spark's
  // exact-BigDecimal HALF_UP and DuckDB's float-multiply rounding
  // disagree. A fixed 1e-9 epsilon added to the mantissa (identically
  // on both sides) moves the decision boundary to x.xxxx5−1e-9, a
  // point real-valued statistics essentially never hit.

  /** Spark-side 5-significant-digit rounding, as the native
    * [[graft.functions.Sig5]] expression: the composed Column form
    * (kept below as [[sig5Composed]] for the equivalence test)
    * references its input ~6 times and Catalyst clones the child
    * tree into every reference — ruinous when the child is itself
    * expensive and pushdown lands the tree in a join condition (the
    * brute-force cosine scorer paid ~12 dot products per pair). The
    * native expression binds the child once. */
  def sig5(c: Column): Column =
    graft.functions.Sig5.sig5_expr(c.cast("double"))

  /** The original composed-builtins form, kept as the cross-check
    * for the native expression (FunctionsSpec sweeps them equal). */
  def sig5Composed(c: Column): Column = {
    val e = floor(log10(abs(c)))
    val p = pow(lit(10.0), abs(e))
    val m = when(e < 0, lit(1.0) / p).otherwise(p)
    when(c.isNull, lit(null).cast("double"))
      .when(abs(c) < lit(1e-12), lit(0.0))
      .otherwise(round(c / m + lit(1e-9), 5) * m)
  }

  /** Scalar twin of the COLUMN form for the native expression: same
    * formula as [[sig5]](Double) below, plus the NaN/±Inf → NaN
    * collapse the composed tree produced (its exponent long-cast sent
    * every non-finite input to NaN via 0/0 or round's passthrough). */
  def sig5Col(x: Double): Double =
    if (x.isNaN || x.isInfinite) Double.NaN
    else if (math.abs(x) < 1e-12) 0.0
    else {
      val e = math.floor(math.log10(math.abs(x)))
      val p = math.pow(10.0, math.abs(e)) // exact positive power
      val m = if (e < 0) 1.0 / p else p
      java.math.BigDecimal.valueOf(x / m + 1e-9)
        .setScale(5, java.math.RoundingMode.HALF_UP)
        .doubleValue() * m
    }

  /** Driver-side (plain Double) twin of the Column form — same
    * formula, with Spark `round`'s HALF_UP-on-decimal-string
    * semantics (java BigDecimal.valueOf). Used where a statistic is
    * assembled on the driver (fused-profiler correlation matrix). */
  def sig5(x: Double): Double =
    if (x.isNaN) x
    else if (math.abs(x) < 1e-12) 0.0
    else {
      val e = math.floor(math.log10(math.abs(x)))
      val p = math.pow(10.0, math.abs(e)) // exact positive power
      val m = if (e < 0) 1.0 / p else p
      java.math.BigDecimal.valueOf(x / m + 1e-9)
        .setScale(5, java.math.RoundingMode.HALF_UP)
        .doubleValue() * m
    }

  /** DuckDB-side 5-significant-digit rounding of SQL expression `x`.
    * `x` must be a simple column reference / cheap expression — it is
    * expanded several times. */
  def sql(x: String): String = {
    val e = s"floor(log10(abs($x)))"
    val m = s"(CASE WHEN $e < 0 THEN 1.0 / power(10.0, abs($e)) " +
      s"ELSE power(10.0, abs($e)) END)"
    s"CASE WHEN ($x) IS NULL THEN CAST(NULL AS DOUBLE) " +
      s"WHEN abs($x) < 1e-12 THEN 0.0 " +
      s"ELSE round(($x) / $m + 1e-9, 5) * $m END"
  }
}
