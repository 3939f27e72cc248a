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
}
