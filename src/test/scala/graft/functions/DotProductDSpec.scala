package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[DotProductD]] bit-parity: the fused codegen loop must equal the
  * aggregate/zip_with fold it replaced EXACTLY (no tolerance) — each
  * product is an independent IEEE operation and the additions run in
  * the same sequence, so the trained centroids and every ANN oracle
  * result derived from them stay unchanged to the bit. */
class DotProductDSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  test("random double vectors: native == HOF fold, bit for bit") {
    val genVecs: Gen[List[(Seq[Double], Seq[Double])]] = Gen.listOfN(20, for {
      n <- Gen.choose(1, 64)
      a <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
      b <- Gen.listOfN(n, Gen.choose(-1e6, 1e6))
    } yield (a: Seq[Double], b: Seq[Double]))
    val prop = Prop.forAll(genVecs) { vecs =>
      vecs.isEmpty || {
        val df = vecs.toDF("a", "b")
        val rows = df.select(
            DotProductD.dotD(col("a"), col("b")).as("native"),
            hofDot(col("a"), col("b")).as("hof"))
          .collect()
        rows.forall { r =>
          java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("nulls and length mismatch follow the guarded semantics") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))), // min-length prefix
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)
    ).toDF("a", "b")
    val got = df.select(DotProductD.dotD(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }
}
