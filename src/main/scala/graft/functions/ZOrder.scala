package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Morton (z-order) curve values from built-in bit arithmetic.
  *
  * Multi-dimensional data layout: sorting/range-partitioning a table by
  * `zvalue(x, y, bits)` clusters rows so that EVERY interleaved dimension
  * has a narrow min/max range per file — file- and row-group-level stats
  * then prune scans for predicates on either dimension (a linear sort
  * only prunes its leading column). This is the standard layout strategy
  * for multi-dimensional scan-heavy workloads at 100 TB; see ZOrderSpec
  * for the measured pruning proof and the `q_zorder` gate for the value
  * computation's cross-engine oracle.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (odd bit positions) and `y`
    * (even positions) into a single z-value. Pure `shiftleft`/`bitwiseAND`
    * composition — whole-stage codegen, no UDF, usable directly in
    * `repartitionByRange`/`sortWithinPartitions`.
    */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    // 2*i+1 must stay below 64: long shifts wrap mod 64, so bits > 31
    // would silently corrupt the interleave (ADVICE r3).
    require(bits >= 1 && bits <= 31,
      s"zvalue supports 1..31 bits per dimension, got $bits")
    (0 until bits).map { i =>
      F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1L)), 2 * i + 1) +
        F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1L)), 2 * i)
    }.reduce(_ + _)
  }
}
