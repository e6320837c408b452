package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) encoding — the multi-dimensional data-layout op:
  * interleave the bits of two coordinates so rows close in BOTH
  * dimensions land close in ONE sort order. Laying a 100 TB table out
  * by z-value (range partition + sort within partitions) gives every
  * file a tight min/max bounding box in *both* coordinates, so a
  * two-dimensional predicate prunes files the way a one-dimensional
  * sort only manages for its leading column.
  *
  * Contract: coordinates are 31-bit non-negative codes (raw keys wider
  * than that should be range- or bucket-coded first — layout wants
  * coarse codes, not exact keys). Two 31-bit inputs interleave into a
  * 62-bit z-value: the sign bit is never touched, so the arithmetic is
  * identical in any engine with 64-bit integers — the five
  * spread-shift-mask steps below are replayed verbatim by the
  * generated SQL twin ([[zValueSql]]), keeping the operator
  * hash-checkable.
  */
object ZOrder {

  /** (shift, mask) schedule spreading 31 bits to even positions —
    * shared by the Column expression and the SQL generator. Masked
    * values never exceed 62 bits mid-chain, so no engine's overflow
    * check can fire. */
  private val Steps = Seq(
    16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 31 bits of `x` so bit i lands at position 2i. */
  def spreadBits(x: Column): Column =
    Steps.foldLeft(x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (v, (sh, m)) => v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(m))
    }

  /** 62-bit Morton code of (a, b): a's bits at even positions, b's at
    * odd. Monotone locality: points in a 2^k-aligned square share a
    * z-value prefix. */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** SQL twin of [[spreadBits]] over expression text `e` — generated
    * from the same Steps schedule so the surfaces cannot drift. The
    * leading BIGINT cast matters: DuckDB shifts in the operand's
    * width, and a 32-bit INTEGER would overflow at the first step. */
  def spreadSql(e: String): String =
    Steps.foldLeft(s"((CAST($e AS BIGINT)) & 2147483647)") {
      case (v, (sh, m)) => s"((($v | ($v << $sh)) & $m))"
    }

  /** SQL twin of [[zValue]]. */
  def zValueSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
