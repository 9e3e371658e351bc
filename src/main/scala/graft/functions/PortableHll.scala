package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable HyperLogLog: explicit (bucket, max-rho) registers
  * over the [[Hashing.md5Long]] 60-bit hash, with an all-integer
  * register algebra and an estimator built ONLY from operations with
  * IEEE correctly-rounded guarantees (long→double conversion, one
  * division, floor) — so the sketch AND its estimate are bit-identical
  * in any engine, and the queries built on it hash-match a DuckDB
  * oracle where native sketches (Spark HLL++ / DataSketches vs DuckDB's
  * HLL) never can: their register hashing, bias tables, and estimate
  * interpolation are implementation-specific (the reason
  * a2_approx_distinct/a15_hll_union sat `no_oracle` through round 12).
  *
  * Register: bucket = top `p` bits of the 60-bit hash; rho = leading
  * zeros of the remaining `60-p` bits + 1 (computed as a pure integer
  * comparison cascade — no float log2 at the powers-of-two boundaries).
  * Register state folds by MAX: commutative, associative, idempotent —
  * the merge that makes per-partition partial aggregation exact and
  * per-source sketches unionable by register-wise max.
  *
  * Estimate: raw harmonic mean in 2⁴⁸ fixed point —
  * z48 = Σ_buckets ⌊2⁴⁸ / 2^reg⌋ (empty bucket ⇒ 2⁴⁸), then
  * est = ⌊alpha·m²·2⁴⁸ / z48⌋ with the numerator a shared double
  * literal. No small-range (linear-counting) branch: it needs ln, which
  * has no cross-engine rounding guarantee — so choose `p` such that
  * expected cardinalities sit ≥ 2.5·m (the raw estimator's domain);
  * below that the estimate is deterministic but biased, which the query
  * docs state. Standard error ≈ 1.04/√m.
  */
object PortableHll {

  /** alpha(m) — the standard HLL bias constant for m = 2^p ≥ 128. */
  private def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** The estimator numerator alpha·m²·2⁴⁸ as a double (a LITERAL shared
    * verbatim with the oracle SQL — Double.toString round-trips, so both
    * engines parse the identical IEEE value).
    */
  def alphaNum(p: Int): Double = {
    val m = 1 << p
    alpha(m) * m.toDouble * m.toDouble * math.pow(2.0, 48)
  }

  /** Register bucket of a 60-bit hash: its top `p` bits. */
  def bucket(h: Column, p: Int): Column = shiftright(h, 60 - p)

  /** rho of a 60-bit hash: leading zeros of the low `60-p` bits + 1
    * (all-zero window ⇒ 60-p+1). Pure integer comparison cascade.
    */
  def rho(h: Column, p: Int): Column = {
    val wbits = 60 - p
    val w = h.bitwiseAND(lit((1L << wbits) - 1))
    lit(wbits + 1) -
      (0 until wbits).map(k => when(w >= lit(1L << k), 1).otherwise(0))
        .reduce(_ + _)
  }

  /** (z48, est) aggregate columns over a register frame's `reg` column
    * — apply in a groupBy over whatever key owns the sketch (or none).
    * Missing buckets (m - observed) contribute 2⁴⁸ each.
    */
  def z48(reg: Column, p: Int): Column =
    // per-row shift amount: the `shiftright(Column, Int)` DSL form only
    // takes literal shifts, so call the SQL function by name
    sum(call_function("shiftright", lit(1L << 48), reg.cast("int"))).cast("long") +
      (lit((1L << p).toLong) - count(lit(1))) * lit(1L << 48)

  /** The raw-HLL estimate from a z48 value. */
  def estimate(z48: Column, p: Int): Column =
    floor(lit(alphaNum(p)) / z48.cast("double")).cast("long")

  // ---- DuckDB SQL generators (same constants, same ops) ---------------

  /** 60-bit md5 hash of a VARCHAR SQL expression. */
  def duckH(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** SQL for the low-window value (AND mask) of hash column `h`. */
  def duckWindow(h: String, p: Int): String =
    s"($h & ${(1L << (60 - p)) - 1})"

  /** SQL for rho from a window column `w` — the identical cascade. */
  def duckRho(w: String, p: Int): String = {
    val wbits = 60 - p
    val terms = (0 until wbits)
      .map(k => s"(CASE WHEN $w >= ${1L << k} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"(${wbits + 1} - ($terms))"
  }

  /** SQL for z48 over a register relation's `reg` column. */
  def duckZ48(p: Int): String =
    s"(sum(${1L << 48} >> reg)::BIGINT + (${(1L << p).toLong} - count(*)) * ${1L << 48})"

  /** SQL for the estimate from a z48 SQL expression. */
  def duckEstimate(z48: String, p: Int): String =
    s"CAST(floor(${alphaNum(p)} / ($z48)::DOUBLE) AS BIGINT)"
}
