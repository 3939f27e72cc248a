package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the most recent right row with the
  * same key and time <= left time". This is the batch form of the
  * reference's co-process operators that hold the latest value of one
  * stream in keyed state while the other streams past it
  * (MarketDataflow.java:190-268 latest-price pricing,
  * SharePriceDataflow.java:227-266 latest-hype composition,
  * MonkeyStockTrader.java:208-236 latest-price matcher).
  *
  * Spark-first implementation: tag-union both sides, single shuffle on
  * the key, one window sort, `last(value, ignoreNulls)` carries the
  * most recent right value forward onto left rows. Compared to the
  * naive range-join (O(n·m) per key + dedup), this is one
  * shuffle + one sort — the same cost profile as a sort-merge join,
  * with no skew amplification on dense right sides; at 100 TB both
  * sides stream through a single partitioned sort.
  */
object AsOfJoin {

  /** @param left      left frame
    * @param right     right frame
    * @param key       equi-key column name present in both
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param valueCols (right column → output name) pairs to carry onto
    *                  left rows
    * @return left rows + carried right values (null when no right row
    *         precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    // Tag-union: right rows sort strictly before left rows at equal
    // timestamps (side 0 < side 1) so a right row at time t prices a
    // left row at the same t — matching the reference's "state written
    // before flatMap1 reads it" semantics.
    // Carried values travel inside ONE struct that is null exactly on
    // left rows: last(..., ignoreNulls) must skip left placeholders but
    // NOT a matched right row whose value happens to be NULL (raw-value
    // carry would silently fall back to an older right row there).
    val l = left.withColumn("__side", lit(1))
      .withColumn("__t", col(leftTime))
      .select(leftCols.map(col) :+ col("__side") :+ col("__t") :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          valueCols.map { case (c, o) =>
            org.apache.spark.sql.types.StructField(o, right.schema(c).dataType) }
        )).as("__vpack"): _*)
    val r = right.select((leftCols.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side") :+ col(rightTime).as("__t")) :+
        struct(valueCols.map { case (c, o) => col(c).as(o) }: _*).as("__vpack"): _*)
    // __vpack as the FINAL sort key (ADVICE r9): two right rows for the
    // same key at the same microsecond would otherwise have unspecified
    // relative order, making last() partition-order-dependent. With the
    // pack in the order, the carried value at a tied instant is the
    // GREATEST value-pack — a total order, identical on every run and
    // layout. (Carried values must therefore be orderable types —
    // scalars/arrays/structs, not maps.)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__vpack"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__c", last(col("__vpack"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map { case (_, o) =>
        col(s"__c.$o").as(o) }: _*)
  }

  /** Nearest-in-time variant of [[asOf]]: each left row matches the
    * right row with the same key MINIMIZING |t_right − t_left|,
    * looking in BOTH directions (equal distances, and an equal-time
    * right row, resolve BACKWARD — the deterministic "prefer what
    * already happened" contract). The sensor-fusion / label-alignment
    * join: align each observation with its closest reading, not just
    * the preceding one.
    *
    * Same scale shape as [[asOf]]: tag-union, ONE shuffle on the key;
    * two sort orders ride that single exchange — the backward carry is
    * last-ignoreNulls over the ascending RUNNING frame, the forward
    * carry last-ignoreNulls over the DESCENDING running frame (provably
    * the ascending order's first-following non-null; see the inline
    * note — an UnboundedFollowing frame would re-aggregate
    * current-to-end per row, O(rows²) per key). At equal timestamps
    * right rows sort before left, so the backward frame sees them and
    * the forward frame never double-counts them. The pick is one
    * integer µs distance comparison. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String,
                  valueCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    val packType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rt",
        org.apache.spark.sql.types.LongType) +:
      valueCols.map { case (c, o) =>
        org.apache.spark.sql.types.StructField(o, right.schema(c).dataType) })
    val l = left.withColumn("__side", lit(1))
      .withColumn("__t", unix_micros(col(leftTime).cast("timestamp")))
      .select(leftCols.map(col) :+ col("__side") :+ col("__t") :+
        lit(null).cast(packType).as("__vpack"): _*)
    val rt = unix_micros(col(rightTime).cast("timestamp"))
    val r = right.select((leftCols.map(c =>
        if (c == key) col(key) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side") :+ rt.as("__t")) :+
        struct(rt.as("__rt") +:
          valueCols.map { case (c, o) => col(c).as(o) }: _*).as("__vpack"): _*)
    // same deterministic tie key as [[asOf]]: equal-instant right rows
    // resolve by value-pack order (greatest wins backward, least wins
    // forward) — partition-order-independent either way.
    // The forward carry rides the REVERSED total order as a RUNNING
    // frame, not a [current → unboundedFollowing] frame: Spark's
    // UnboundedFollowing frame re-aggregates current-to-end for every
    // row — O(rows²) per key at scale — while a running frame
    // accumulates in one pass. (__t, __side, __vpack) is a total order
    // up to fully-tied null-pack left rows (which ignoreNulls skips),
    // so `last non-null` under the desc order picks exactly the asc
    // order's first-following non-null pack; desc flips null ordering
    // to NULLS LAST in lockstep. Cost: a second sort order on the same
    // key exchange.
    val ord = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__vpack"))
    val ordRev = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side").desc, col("__vpack").desc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ordRev.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = l.unionByName(r)
      .withColumn("__b", last(col("__vpack"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__vpack"), ignoreNulls = true).over(wf))
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .when(col("__t") - col("__b.__rt") <= col("__f.__rt") - col("__t"),
        col("__b"))
      .otherwise(col("__f"))
    u.filter(col("__side") === 1)
      .withColumn("__pick", pick)
      .select(leftCols.map(col) ++ valueCols.map { case (_, o) =>
        col(s"__pick.$o").as(o) }: _*)
  }
}
