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
}
