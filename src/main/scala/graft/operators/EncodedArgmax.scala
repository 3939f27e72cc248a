package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-width argmax/argmin encodings for two-key aggregates — the
  * general form of Similarity's assignment fix (r10): `max(struct(a,
  * b))` / `min_by(v, struct(…))` carry a STRUCT in the aggregation
  * buffer, which bars the hash aggregate and silently plans a
  * SortAggregate — over a join-exploded or corpus-keyed stream that
  * sorts pair-scale data to disk (PlanSweep now gates the whole
  * class). Packing (score, id) into ONE long keeps the buffer
  * primitive: whole-stage-codegen'd HashAggregate with map-side
  * combine.
  *
  * Encoding: base-2³² digits, score in the high word, id in the low —
  * long order IS the lexicographic (score, id-tiebreak) order. Domain
  * contract, enforced LOUDLY in-plan (raise_error, not silent
  * wrapping): 0 ≤ id < 2³², 0 ≤ score < 2³¹. Callers with wider
  * domains keep the struct form and declare the SortAggregate in
  * PlanSweep instead.
  */
object EncodedArgmax {

  val Base: Long = 4294967296L // 2^32

  // Nulls fail loudly too (ADVICE r10): a when-guard alone passes a
  // NULL score/id through to a null encoding, silently DROPPING the
  // row from the max/min — whereas the struct forms this replaces
  // still ranked rows with null fields. No internal caller produces
  // nulls here, so out-of-domain and null are the same class of
  // contract violation: both raise.
  private def guard(c: Column, what: String, bound: Long): Column =
    when(c.isNull,
      raise_error(lit(s"EncodedArgmax: $what is NULL - null rows would " +
        "silently drop out of the argmax; filter or coalesce upstream")))
      .when(c < 0 || c >= bound,
        raise_error(concat(
          lit(s"EncodedArgmax: $what outside encodable [0, $bound): "),
          c.cast("string"))))
      .otherwise(c)

  /** Encode for `max`: picks greatest score, smallest id on ties. */
  def maxScoreMinId(score: Column, id: Column): Column =
    guard(score, "score", Base / 2) * lit(Base) +
      (lit(Base - 1) - guard(id, "id", Base))

  // encoded values are non-negative by construction, so shift/mask
  // decode exactly (a plain `/` on longs would go through DOUBLE)
  def decodeScore(enc: Column): Column = shiftright(enc, 32)

  def decodeMaxId(enc: Column): Column =
    lit(Base - 1) - enc.bitwiseAND(lit(Base - 1))

  /** Encode for `min`: picks smallest score, smallest id on ties. */
  def minScoreMinId(score: Column, id: Column): Column =
    guard(score, "score", Base / 2) * lit(Base) + guard(id, "id", Base)

  def decodeMinId(enc: Column): Column = enc.bitwiseAND(lit(Base - 1))
}
