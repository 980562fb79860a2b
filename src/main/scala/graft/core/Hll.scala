package graft.core

/** HyperLogLog constants and scalar kernels — the single source of truth
  * for the batch operator (SketchOps.hllDistinct), the streaming twin
  * (StreamingOps.hllStream) and the DuckDB oracle SQL (SparkEntry
  * interpolates these constants), so a parameter change cannot drift
  * between the three forms.
  *
  * Contract: hashes must be NONNEGATIVE (e.g. the 61-bit docFingerprint).
  * All register math is integer: rho = trailing zeros of (hash div m) + 1
  * capped at RhoCap; the harmonic sum is kept as int64 (each register
  * contributes 2^(RhoCap - rho), empty registers 2^RhoCap; max m·2^RhoCap
  * << 2^63), and the estimate is ONE double division rounded HALF_UP —
  * deterministic across engines.
  */
object Hll {
  val M = 64
  val RhoCap = 44
  val Scale: Long = 1L << RhoCap
  /** alpha_64 = 0.7213 / (1 + 1.079/64), the standard bias constant. */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M.toDouble)
  /** Numerator of the raw estimator: alpha · m² · 2^RhoCap. */
  val EstNumerator: Double = Alpha * (M.toDouble * M.toDouble) * Scale.toDouble

  /** Register index of a nonnegative hash. */
  def reg(h: Long): Int = (h % M).toInt

  /** Rank of a nonnegative hash (trailing zeros of h div m, +1, capped). */
  def rho(h: Long): Int =
    math.min(java.lang.Long.numberOfTrailingZeros(h >>> 6) + 1, RhoCap)

  /** Raw estimate · 1000, rounded HALF_UP (matches Spark/DuckDB round). */
  def estE3(regSum: Long): Long =
    java.math.BigDecimal.valueOf(EstNumerator / regSum * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}
