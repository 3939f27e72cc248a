package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hashing primitives.
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` disagree, so every
  * operator whose results must match the DuckDB oracle derives integer
  * hashes from md5 hex digests: both engines produce identical md5 hex,
  * and 15 hex digits (60 bits) fit a signed 64-bit int.
  * DuckDB twin: `('0x' || substr(md5(x),1,15))::BIGINT`.
  */
object Hashing {

  private val P31: Long = 2147483647L // 2^31 - 1, Mersenne prime

  /** 60-bit integer hash of a string column (md5-derived). Native
    * expression ([[Md5Long60]]) — same value as the former
    * `conv(substring(md5(c),1,15),16,10)` chain without the hex-string
    * round trip (~150× less per-value CPU, measured). */
  def md5Long(c: Column): Column = Md5Long60.md5Long60(c)

  /** Hash reduced mod 2^31-1 so affine re-hashes (a*h+b) stay in Long
    * range: a,b < 2^31 and h < 2^31 → a*h+b < 2^62. */
  def md5Mod31(c: Column): Column = md5Long(c) % P31

  /** The j-th MinHash permutation: (a_j * h + b_j) mod (2^31-1) with
    * fixed odd multipliers — identical integer arithmetic in DuckDB.
    * DuckDB twin: ((2*j+1) * hmod + 12345*(j+1)) % 2147483647. */
  def affine(hMod31: Column, j: Int): Column =
    (hMod31 * lit(2L * j + 1) + lit(12345L * (j + 1))) % lit(P31)

  private val P61: Long = (1L << 61) - 1 // 2^61 - 1, Mersenne prime

  /** The j-th MinHash permutation over the FULL 60-bit hash —
    * (a_j · h + b_j) mod (2^61 − 1), the wide family that replaces
    * [[affine]] on the near-dup identity paths (r12): two distinct
    * tokens colliding mod 2^31−1 collide under EVERY 31-bit perm, so
    * the false-flag tail of an LSH gate grows with corpus size — the
    * 8M-doc sigstore rung broke its gate exactly this way, and at
    * 10⁹-doc scale the 31-bit space saturates outright. At 61 bits
    * the same class is P ≈ V²/2⁶¹ — gone.
    *
    * a_j·h would overflow a long (h < 2⁶⁰, a_j ≤ 2⁷), so the product
    * is computed mod the Mersenne prime with SPLIT arithmetic kept
    * inside 63 bits — exact, declarative, codegen-friendly:
    * h = hHi·2³¹ + hLo; a·h ≡ fold(a·hHi · 2³¹) + a·hLo where
    * fold(t·2³¹) = (t >> 30) + ((t & (2³⁰−1)) << 31) because
    * 2⁶¹ ≡ 1 (mod 2⁶¹−1). Every intermediate < 2⁶². The DuckDB twin
    * is the direct HUGEINT form
    * CAST((CAST(a AS HUGEINT)·h + b) % 2305843009213693951 AS BIGINT)
    * — equality of the two forms is property-verified. */
  def affine61(h: Column, j: Int): Column = {
    val m = 2L * j + 1
    val b = 12345L * (j + 1)
    val t1 = shiftright(h, 31) * lit(m)
    val folded = shiftright(t1, 30) +
      shiftleft(t1.bitwiseAND(lit(0x3FFFFFFFL)), 31)
    (folded + (h.bitwiseAND(lit(0x7FFFFFFFL)) * lit(m)) + lit(b)) % lit(P61)
  }
}
