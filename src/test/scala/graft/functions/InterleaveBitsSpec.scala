package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Native Morton interleave vs a plain-Scala reference: bit layout
  * (column 0 most significant per level), curve-order monotonicity,
  * loud domain violations on BOTH execution paths, null propagation,
  * and the SQL registration (the oracle twin's 16-term bit-select sum
  * is this same formula spelled out in DuckDB SQL).
  */
class InterleaveBitsSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val k = vals.length
    vals.zipWithIndex.map { case (v, j) =>
      (0 until bits).map(i => ((v >> i) & 1L) << (i * k + (k - 1 - j))).sum
    }.sum
  }

  test("golden 2-column layout: z = ... a1 b1 a0 b0") {
    // a=0b10, b=0b01 at 2 bits: positions a1->3, b1->2, a0->1, b0->0
    // => 1000 | 0001 ... a1=1, a0=0, b1=0, b0=1 => 0b1001 = 9
    val got = Seq((2L, 1L)).toDF("a", "b")
      .select(InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 2))
      .as[Long].head()
    assert(got == 9L)
    assert(refZ(Seq(2L, 1L), 2) == 9L)
  }

  test("matches the Scala reference across 2- and 3-column domains") {
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got2 = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (a, b, z) => assert(z == refZ(Seq(a, b), 8)) }

    val triples = Seq.fill(200)((rng.nextInt(32).toLong,
      rng.nextInt(32).toLong, rng.nextInt(32).toLong))
    val got3 = triples.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        InterleaveBits.interleaveBits(Seq(col("a"), col("b"), col("c")), 5).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (a, b, c, z) => assert(z == refZ(Seq(a, b, c), 5)) }
  }

  test("interpreted path (filter predicate) agrees with the projected/codegen path") {
    val rows = Seq((3L, 200L), (255L, 0L), (0L, 255L), (128L, 128L))
    val z = InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 8)
    val proj = rows.toDF("a", "b").select(col("a"), col("b"), z.as("z"))
      .as[(Long, Long, Long)].collect().toMap2
    val filtered = rows.toDF("a", "b")
      .filter(z === lit(refZ(Seq(255L, 0L), 8)))
      .as[(Long, Long)].collect()
    assert(filtered.toSeq == Seq((255L, 0L)))
    proj.foreach { case ((a, b), zv) => assert(zv == refZ(Seq(a, b), 8)) }
  }

  test("curve locality: sorting by z bounds BOTH coordinates on every cell") {
    // full 16x16 grid at 4 bits; every 16-row cell (z div 16) must span
    // a 4x4 box in (a, b) — the envelope promise dsZorder aggregates
    val grid = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val cells = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 4).as("z"))
      .groupBy((col("z") / 16).cast("long").as("cell"))
      .agg(max(col("a")) - min(col("a")), max(col("b")) - min(col("b")),
        count(lit(1)))
      .as[(Long, Long, Long, Long)].collect()
    assert(cells.length == 16)
    cells.foreach { case (_, aSpan, bSpan, n) =>
      assert(n == 16 && aSpan == 3 && bSpan == 3)
    }
  }

  test("out-of-range value raises loudly on both paths") {
    val z = InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 4)
    val ex1 = intercept[Exception] {
      Seq((16L, 0L)).toDF("a", "b").select(z).collect()
    }
    assert(ex1.getMessage.contains("interleave_bits") ||
      Option(ex1.getCause).exists(_.getMessage.contains("interleave_bits")))
    val ex2 = intercept[Exception] {
      Seq((0L, -1L)).toDF("a", "b").filter(z === 0L).collect()
    }
    assert(ex2.getMessage.contains("interleave_bits") ||
      Option(ex2.getCause).exists(_.getMessage.contains("interleave_bits")))
  }

  test("null input propagates null; type/arity contract violations fail analysis") {
    val got = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 8))
      .collect()
    assert(got.head.isNullAt(0))
    // > 63 output bits refused
    val wide = intercept[Exception] {
      Seq((1L, 1L)).toDF("a", "b")
        .select(InterleaveBits.interleaveBits(Seq(col("a"), col("b")), 32))
        .collect()
    }
    assert(wide.getMessage.contains("63") ||
      Option(wide.getCause).exists(_.getMessage.contains("63")))
  }

  test("SQL registration: interleave_bits(bits, a, b) callable from spark.sql") {
    org.apache.spark.sql.GraftSqlBridge.registerAll(spark)
    val df = spark.sql(
      "SELECT interleave_bits(8, CAST(200 AS BIGINT), CAST(3 AS BIGINT)) AS z")
    assert(df.as[Long].head() == refZ(Seq(200L, 3L), 8))
  }

  private implicit class TupleOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map { case (a, b, z) => ((a, b), z) }.toMap
  }
}
