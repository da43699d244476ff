package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing for sampling / splitting.
  *
  * The r2 `(key * 2654435761) % 100` bucket depended only on `key mod 100`
  * (the multiplier is coprime to 100, so it merely permutes residues):
  * residue-striped key sets (ids ≡ 0 mod 100, all-even snowflake ids) landed
  * entirely in one bucket, and the raw multiply overflowed under ANSI mode
  * for keys ≥ ~3.5e9. This replaces it with a 32-bit avalanche hash built
  * from overflow-free BIGINT arithmetic (`pmod`/multiply/xor/shift only), so
  * the exact same integer comes out of Spark and of any SQL engine
  * (the DuckDB mirror fragments are generated alongside) — deterministic
  * sampling stays reproducible across runs AND engines.
  *
  * Rounds: fold to 31 bits, Knuth multiplicative step mod 2^32, then two
  * xorshift-multiply finalizer rounds (the classic lowbias32 shape). Every
  * intermediate stays below 2^63 (max is 2^31·2654435761 ≈ 5.7e18), so ANSI
  * arithmetic never overflows for any long key.
  */
object PortableHash {

  private val M31 = 2147483647L // 2^31 - 1
  private val M32 = 4294967296L // 2^32
  private val KNUTH = 2654435761L
  private val FIN = 73244475L // 0x45d9f3b

  /** Avalanching hash of an integral column into [0, 2^32). */
  def hash32(key: Column): Column = {
    val h0 = pmod(key.cast("long"), lit(M31))
    val h1 = pmod(h0 * lit(KNUTH), lit(M32))
    val m1 = h1.bitwiseXOR(shiftright(h1, 16))
    val h2 = pmod(m1 * lit(FIN), lit(M32))
    h2.bitwiseXOR(shiftright(h2, 16))
  }

  /** Uniform bucket in [0, m) — replaces the residue-biased modulo split. */
  def bucket(key: Column, m: Int): Column = pmod(hash32(key), lit(m.toLong))

  /** Deterministic uniform draw in (0, 1): (hash32 + 0.5) / 2^32. Both the
    * numerator and the power-of-two division are exact in doubles, so every
    * engine computes the identical double. */
  def uniform01(key: Column): Column =
    (hash32(key).cast("double") + lit(0.5)) / lit(4294967296.0)

  // ---- DuckDB mirror fragments (nonnegative keys; DuckDB % == pmod there)

  /** SQL fragment computing [[hash32]] of a nonnegative integer expression. */
  def sqlHash32(e: String): String = {
    val h1 = s"((($e) % $M31) * $KNUTH) % $M32"
    val m1 = s"xor(($h1), ($h1) >> 16)"
    val h2 = s"(($m1) * $FIN) % $M32"
    s"xor(($h2), ($h2) >> 16)"
  }

  /** SQL fragment computing [[bucket]]. */
  def sqlBucket(e: String, m: Int): String = s"((${sqlHash32(e)}) % $m)"

  /** SQL fragment computing [[uniform01]]. */
  def sqlUniform01(e: String): String =
    s"((CAST(${sqlHash32(e)} AS DOUBLE) + 0.5) / 4294967296.0)"
}
