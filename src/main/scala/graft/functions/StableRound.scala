package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine-stable fixed-point rounding.
  *
  * `round(x, n)` semantics DIVERGE between engines on ties whose double is
  * not binary-exact (Spark rounds the exact decimal expansion HALF_UP;
  * DuckDB rounds the ×10^n-scaled double), and `round` can emit -0.0 where
  * the other engine emits 0.0 — both break the driver's bit-exact hash
  * compare even when every meaningful digit agrees.
  *
  * `floor(x·10^n + 0.5)/10^n` depends only on the (identical) input double,
  * never on a round() implementation, and its result is an integer divided
  * by 10^n — so it can never produce -0.0. The SQL oracle must spell the
  * SAME formula (`floor(expr * 100 + 0.5) / 100`).
  *
  * Use this for aggregates over CONTINUOUS doubles (e.g. events.value).
  * Sums over 2-decimal business domains (prices, quantities) keep plain
  * `round` — their ties are terminating decimals that are binary-exact.
  *
  * NEGATIVE inputs: this is round-half-toward-POSITIVE-infinity, not
  * HALF_UP (half-away-from-zero). A tie like -1.005 rounds to -1.0 here
  * where HALF_UP gives -1.01 — asymmetric with the positive side. Both
  * engines compute the identical formula, so the cross-engine gate holds
  * regardless of sign (negative values do occur: raw cosines in
  * Similarity can be < 0); the asymmetry is a documented property of the
  * formula, chosen because it is the only tie rule both engines evaluate
  * bit-identically from the same double.
  */
object StableRound {
  /** Stable 2-decimal rounding: `floor(c*100 + 0.5)/100`. */
  def r2(c: Column): Column = floor(c * 100 + 0.5) / 100

  /** Stable 4-decimal rounding: `floor(c*10000 + 0.5)/10000`. */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
}
