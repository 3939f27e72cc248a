package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[AdcSum]] equals the m-way element_at chain it replaced (exact
  * integer sums — identical by construction, pinned anyway), on the
  * codegen'd path (plain select) and the interpreted eval path
  * (filter-pushed), plus the null contract. */
class AdcSumSpec extends SparkSpec {
  import spark.implicits._

  private val m = 8
  private val ksub = 16

  private def chain(lut: org.apache.spark.sql.Column) =
    (0 until m).map(j =>
      element_at(lut, (col(s"c$j") + lit(j.toLong * ksub + 1)).cast("int")))
      .reduce(_ + _)

  test("random LUTs and codes: native == element_at chain") {
    val gen: Gen[List[(Seq[Long], Seq[Long])]] = Gen.listOfN(12, for {
      lut <- Gen.listOfN(m * ksub, Gen.choose(0L, 4000000000000L))
      codes <- Gen.listOfN(m, Gen.choose(0L, (ksub - 1).toLong))
    } yield (lut: Seq[Long], codes: Seq[Long]))
    val prop = Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("lut", "codes")
          .select(col("lut") +:
            (0 until m).map(j => element_at(col("codes"), j + 1).as(s"c$j")): _*)
        df.select(
            AdcSum.adcSum(col("lut"), (0 until m).map(j => col(s"c$j")), ksub).as("n"),
            chain(col("lut")).as("h"))
          .collect().forall(r => r.getLong(0) == r.getLong(1))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("null LUT or null code yields null; interpreted eval path agrees") {
    val df = Seq(
      (Some(Seq.fill(m * ksub)(7L)), Some(0L)),
      (None: Option[Seq[Long]], Some(0L)),
      (Some(Seq.fill(m * ksub)(7L)), None: Option[Long])
    ).toDF("lut", "c")
    val codes = col("c") +: Seq.fill(m - 1)(lit(0L))
    val got = df.select(AdcSum.adcSum(col("lut"), codes, ksub).as("s"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(Some(7L * m), None, None), got.mkString(","))
    // interpreted path: the expression inside a filter predicate
    val kept = df.filter(AdcSum.adcSum(col("lut"), codes, ksub) === lit(7L * m))
      .count()
    assert(kept == 1L)
  }

  test("out-of-range code and short LUT fail loudly on both paths") {
    def boom(lut: Seq[Long], code: Long, viaFilter: Boolean): String = {
      val df = Seq((lut, code)).toDF("lut", "c")
      val codes = col("c") +: Seq.fill(m - 1)(lit(0L))
      val e = intercept[Exception] {
        val s = AdcSum.adcSum(col("lut"), codes, ksub)
        if (viaFilter) df.filter(s > 0L).count() // interpreted eval
        else df.select(s).collect()              // codegen
      }
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    val full = Seq.fill(m * ksub)(7L)
    for (viaFilter <- Seq(false, true)) {
      assert(boom(full, ksub.toLong, viaFilter).contains("outside [0, 16)"))
      assert(boom(full, -1L, viaFilter).contains("outside [0, 16)"))
      assert(boom(full.take(ksub), 0L, viaFilter).contains("entries, need >"))
      // the check reads the UNTRUNCATED long: 2^32+3 would wrap to an
      // in-range 3 under an (int) cast and silently read the wrong slot
      assert(boom(full, (1L << 32) + 3L, viaFilter).contains("outside [0, 16)"))
    }
  }

  test("null LUT slot propagates null, as the element_at chain did") {
    // slot 0 (= code 0 of sub 0) is null; codes all 0 hit it
    val lut: Seq[Option[Long]] = None +: Seq.fill(m * ksub - 1)(Some(7L))
    val df = Seq(Tuple1(lut)).toDF("lut")
    val codes = Seq.fill(m)(lit(0L))
    val viaSelect = df.select(AdcSum.adcSum(col("lut"), codes, ksub).as("s"))
      .collect().head
    assert(viaSelect.isNullAt(0))
    // interpreted path agrees: null compares as unknown, row filtered out
    assert(df.filter(AdcSum.adcSum(col("lut"), codes, ksub) === 0L).count() == 0L)
    // a non-null path through the same LUT still sums
    val codes1 = Seq.fill(m)(lit(1L))
    val ok = df.select(AdcSum.adcSum(col("lut"), codes1, ksub)).collect().head
    assert(ok.getLong(0) == 7L * m)
  }
}
