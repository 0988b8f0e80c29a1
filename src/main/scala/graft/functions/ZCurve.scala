package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding over two numeric columns — the
  * multi-dimensional layout key behind data-skipping file clustering:
  * sorting a table by `zValue` makes every written file cover a small
  * RECTANGLE of (x, y) space, so parquet min/max stats prune files for
  * range predicates on EITHER OR BOTH dimensions, where a plain
  * lexicographic sort only ever prunes on its leading column. All
  * arithmetic is exact non-negative integer bit math (shift/and/or —
  * the standard magic-masks bit spread), identical in any engine, so
  * the encoding itself is oracle-verifiable.
  *
  * Everything here is a pure per-row projection inside whole-stage
  * codegen — zero shuffle, zero state; the one tiny min/max bounds
  * aggregate a caller needs for [[scaleTo16]] broadcasts.
  */
object ZCurve {

  /** Spread the low 16 bits of a non-negative long to the even bit
    * positions of a 32-bit value (0babcd → 0b0a0b0c0d). */
  def spread16(c: Column): Column = {
    val s0 = c.bitwiseAND(lit(65535L))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(16711935L))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(252645135L))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(858993459L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(1431655765L))
  }

  /** Interleave two 16-bit-scaled coordinates into the 32-bit Morton
    * value: x on even bits, y on odd. */
  def zValue(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** Scale a long column into [0, 65535] given its global lo/hi bound
    * COLUMN NAMES (from a broadcast min/max aggregate crossJoined in).
    * Small spans STRETCH — (c−lo)·65535 DIV (hi−lo), so a
    * 300-distinct-user dimension fills all 16 bits instead of a
    * low-order sliver whose high z-bits are constant (which would
    * silently degrade the curve to a single-dimension sort); huge
    * spans SHRINK by bucket width — (c−lo) DIV ((hi−lo) DIV 65536 + 1)
    * — because the stretch multiply blows 64 bits on epoch-µs spans.
    * The branch threshold 10¹⁴ keeps the multiply under 2⁶³; both
    * branches are exact non-negative integer arithmetic, monotone, and
    * ≤ 65535; a constant column (hi = lo) maps to 0. Name-based
    * because Spark's Column API has no integer division; DIV on
    * non-negative longs ≡ DuckDB's //. */
  def scaleTo16(cName: String, loName: String, hiName: String): Column =
    expr(s"""CASE WHEN $hiName = $loName THEN 0
      WHEN $hiName - $loName <= 100000000000000
        THEN (($cName - $loName) * 65535) DIV ($hiName - $loName)
      ELSE ($cName - $loName) DIV (($hiName - $loName) DIV 65536 + 1)
      END""")
}
