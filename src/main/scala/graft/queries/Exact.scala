package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-decimal aggregation helpers.
  *
  * The test tables store money-like values as DOUBLE with ≤2 true decimal
  * digits. Summing those doubles is order-dependent (error grows with group
  * size), and a rounded result sitting near a half-cent boundary then
  * hash-mismatches the DuckDB oracle, whose summation order differs — q9
  * flaked exactly this way in round 3, and any `round(sum(double), 2)` over
  * an unordered group is the same latent flake. Casting each ≤4-decimal
  * factor to decimal(18,4) recovers the true value exactly, making the sum
  * exact, order-independent, and identical across engines; the result is
  * cast back to DOUBLE for oracle schema parity. (Integer-valued doubles
  * like l_quantity sum exactly as doubles and don't need this; ordered
  * window frames add in frame order in both engines and don't either.)
  */
private[queries] object Exact {

  /** Exact decimal(18,4) view of a ≤4-true-decimal double expression. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-independent `round(sum(e), 2)` over an exact decimal expression,
    * surfaced as DOUBLE. */
  def sumRound2(e: Column): Column = round(sum(e), 2).cast("double")
}
