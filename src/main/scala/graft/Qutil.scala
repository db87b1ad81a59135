package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-portable helpers shared by the query batteries. */
object Qutil {
  /** Portable fixed-point rounding: floor(x*10^d + 0.5)/10^d.
    *
    * Unlike `round` (Spark: decimal-string HALF_UP via BigDecimal; DuckDB:
    * binary-double rounding) this evaluates identically in any engine given
    * bit-identical input doubles, so oracle hash-matching never trips on
    * exact decimal half-boundaries like 0.6475745.
    */
  def rnd(c: Column, d: Int): Column = {
    val p = lit(math.pow(10, d))
    floor(c * p + 0.5) / p
  }
}
