package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches with DETERMINISTIC parity: every register value is
  * a pure integer function of the (already oracle-twinned) row hash, so
  * the same sketch — not merely a similar estimate — is computable in the
  * DuckDB oracle and hash-compared.
  */
object SketchOps {

  /** HyperLogLog registers/estimate per group over a 61-bit row hash
    * column (e.g. Fns.docFingerprint).
    *
    * Layout: m=64 registers; register index = hash mod 64; rank rho =
    * trailing zeros of (hash div 64) + 1, capped at 44 (cap keeps the
    * harmonic sum in exact integer arithmetic: sum of 1/2^rho scaled by
    * 2^44 is a sum of int64 powers of two, max 64·2^44 << 2^63 — no
    * floating-point accumulation order anywhere). Estimate =
    * alpha_64·m²·2^44 / regSum, one exact double division rounded to e3.
    *
    * Plan: groupBy(group, register) MAX — map-side partial max collapses
    * each register before the shuffle, so the exchange carries at most
    * m rows per group per input partition regardless of row count — then
    * a tiny per-group rollup. This is the sketch the 10^12-row
    * cardinality pass wants: two narrow shuffles, no distinct.
    *
    * Output: (group, n_regs, reg_sum, est_e3) — n_regs = populated
    * registers (empty ones contribute 2^44 each to the harmonic sum,
    * added as (m - n_regs)·2^44 instead of materializing them).
    *
    * This is the RAW HLL estimator (no small-range linear-counting
    * branch): the correction uses ln(), whose last-ulp behaviour is
    * libm-dependent and would break exact cross-engine parity. Expect
    * the standard ~1.04/sqrt(64) ~ 13% relative error at cardinalities
    * above ~2.5m, more below.
    */
  def hllDistinct(df: DataFrame, groupCol: String, hashCol: Column): DataFrame = {
    val m = 64
    val w = shiftright(hashCol, 6) // hash div 64, exact (hash >= 0)
    val rho = least(
      bit_count((w.bitwiseAND(-w) - lit(1L))) + lit(1), lit(44))
    val regs = df.select(col(groupCol), (hashCol % m).as("reg"), rho.as("rho"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max("rho").as("mrho"))
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_regs"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 44 - mrho)")).as("pop_sum"))
      .select(col(groupCol), col("n_regs"),
        (col("pop_sum") + (lit(64L) - col("n_regs")) * lit(1L << 44)).as("reg_sum"))
      .withColumn("est_e3",
        round(lit(0.7213 / (1.0 + 1.079 / 64.0)) * lit(64.0 * 64.0) *
          lit((1L << 44).toDouble) / col("reg_sum") * lit(1000.0), 0).cast("long"))
  }
}
