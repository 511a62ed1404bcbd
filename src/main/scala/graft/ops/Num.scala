package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric determinism helpers for oracle parity.
  *
  * Floating sums are order-dependent, and Spark's partial aggregation order
  * differs run-to-run and engine-to-engine; hash-comparing against DuckDB
  * needs exact arithmetic. All "money" aggregations therefore accumulate in
  * DECIMAL(18,6) (exact int128 sums in both engines; the double→decimal
  * cast itself is deterministic because no IEEE double sits exactly on a
  * decimal(…,6) midpoint) and only the final value converts back to double.
  * The oracle SQL mirrors the same casts:
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  */
object Num {
  /** Exact sum of a double column, returned as double. */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact-numerator average: decimal sum / count, one double division. */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double") / count(lit(1))

  /** Oracle-side SQL for the same expressions. */
  def sqlExactSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlExactAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"

  /** Cross-engine deterministic half-up rounding: floor(x·10^d + 0.5)/10^d.
    * Spark's round() (HALF_UP on the exact binary expansion) and DuckDB's
    * round() (rounding the scaled product) disagree when x·10^d lands on a
    * representable .5 midpoint; this single IEEE expression is evaluated
    * identically by both engines given bit-identical input. Halves round
    * toward +∞ (same on both sides; all call sites are ≥ −1 values).
    *
    * PRECONDITION: |x|·10^d must stay below 2^63 — Spark's `floor` on a
    * double returns a LONG, so a larger product silently wraps while
    * DuckDB's floor stays double (caught live by the p9 RFM gate when
    * recency was first scored in microseconds: micros-scale quantiles
    * ×10⁶ ≈ 10¹⁹ > 2^63). Rescale the operand to a smaller unit (p9 uses
    * days) rather than rounding huge magnitudes at fine precision.
    */
  def roundTo(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits.toDouble)
    floor(c * p + 0.5).cast("double") / p
  }

  /** DuckDB SQL mirror of [[roundTo]] — literals formatted so both engines
    * parse the exact same double scale. */
  def sqlRoundTo(expr: String, digits: Int): String = {
    val p = "%.1f".format(math.pow(10, digits.toDouble))
    s"floor(($expr) * $p + 0.5) / $p"
  }
}
