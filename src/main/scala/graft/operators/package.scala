package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object operators {

  /** Cross-engine-stable 6-decimal rounding: floor(x·10⁶ + 0.5)/10⁶.
    *
    * `round(x, 6)` is NOT portable: on the same double 0.7709374999999999
    * Spark (exact binary expansion, HALF_UP) yields .770937 while DuckDB
    * (shortest decimal representation) yields .770938. This formulation is
    * pure double arithmetic, so identical inputs give identical outputs in
    * every engine. Valid while |x|·10⁶ < 2⁵³ (all test scale factors; at
    * larger magnitudes switch the output to DECIMAL end-to-end).
    * SQL twin: floor(x * 1000000 + 0.5) / 1000000.
    */
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Order-independent sum for money/value columns: accumulate in
    * DECIMAL(30,8) (exact), surface as double. Parallel double sums differ
    * across engines/partitions in the last ulps once groups span thousands
    * of rows; decimal accumulation makes the pre-rounding value identical
    * everywhere. SQL twin: CAST(sum(CAST(x AS DECIMAL(30,8))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(30,8)")).cast("double")

  /** dsum-based mean (use inside an agg). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
