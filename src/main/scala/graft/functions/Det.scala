package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding.
  *
  * `round(x, 4)` is NOT engine-portable at half-way boundaries: Spark
  * rounds the exact binary double via BigDecimal HALF_UP while DuckDB
  * computes `std::round(x·10⁴)/10⁴`, and the multiply can carry a value
  * across the boundary (observed: 0.48624999999999996 → 0.4862 in Spark
  * vs 0.4863 in DuckDB). `floor(x·10⁴ + 0.5)/10⁴` is composed purely of
  * IEEE-754 ops that both engines execute identically, so the result is
  * bit-identical — the property the oracle hash compare needs.
  *
  * Use [[r4]] in Spark and [[r4Sql]] in the oracle SQL for any value
  * whose last digit could sit near a boundary (ratios of small integers,
  * large aggregated sums).
  */
object Det {

  def r4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  def r4Sql(e: String): String =
    s"(floor(($e) * 10000.0 + 0.5) / 10000.0)"

  /** Finer (1e-6) twin of [[r4]] for values that FEED further arithmetic
    * (the Lloyd's-loop centroid chain): same floor-based formula in both
    * engines, so no engine rounding-mode semantics are involved. */
  def r6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  def r6Sql(e: String): String =
    s"(floor(($e) * 1000000.0 + 0.5) / 1000000.0)"

  // DuckDB-side vector scoring, the ONE copy every ANN/store/retrieval
  // oracle delegates to — the cast/shape must match the Spark kernels'
  // float32-elements-accumulated-in-double contract, and a drift here
  // would skew every oracle the same way (caught) rather than one pair
  // at a time (missed).

  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE))"

  def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE)))"

  def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
