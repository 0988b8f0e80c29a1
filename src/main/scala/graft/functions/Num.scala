package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Cross-engine numeric output discipline.
  *
  * Every query that emits a rounded double shares one hazard: IEEE 754
  * signed zero. A value in (-5e-5, 0) rounds to `-0.0` or `+0.0`
  * depending on the engine's rounding path (Spark's BigDecimal round vs
  * DuckDB's libm), the two zeros hash differently, and one cell flips a
  * whole-result comparison. Four independent queries hit this across
  * three rounds (q54, q88, q103, q112) because each hand-rolled its own
  * `round(x, 4)` — the class survives point fixes, so the collapse
  * lives here once.
  *
  * `x + 0.0` is the standard IEEE signed-zero collapse: `-0.0 + 0.0 ==
  * +0.0`, and every other double (including NaN and ±Inf) is unchanged.
  * Oracles must mirror the same `+ 0.0` after their `round(...)` so both
  * engines collapse identically.
  *
  * Only apply to DOUBLE-typed outputs: on decimals the `+ 0.0` would
  * widen the type to double and break schema parity instead.
  */
object Num {

  /** `round(c, scale) + 0.0` — rounded double with signed zero collapsed. */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** The 4-decimal form used by the query surface's determinism contract. */
  def round4(c: Column): Column = roundz(c, 4)

  /** Collapse signed zero without rounding (for already-rounded values). */
  def zcollapse(c: Column): Column = c + lit(0.0)
}
