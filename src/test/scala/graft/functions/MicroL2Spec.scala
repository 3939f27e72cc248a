package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[MicroL2]] equals the aggregate/zip_with integer fold it replaced
  * (exact integers — identical by construction, pinned anyway), on
  * both the standalone column path and inside a HOF lambda (the
  * pqArgmin shape, where the expression evaluates interpreted with
  * bound lambda variables). */
class MicroL2Spec extends SparkSpec {
  import spark.implicits._

  private def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (s, v) => s + v)

  test("random long vectors: native == HOF fold; also inside a lambda") {
    val genVecs: Gen[List[(Seq[Long], Seq[Long])]] = Gen.listOfN(15, for {
      n <- Gen.choose(1, 16)
      a <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
      b <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L))
    } yield (a: Seq[Long], b: Seq[Long]))
    val prop = Prop.forAll(genVecs) { vecs =>
      vecs.isEmpty || {
        val df = vecs.toDF("a", "b")
        val direct = df.select(
            MicroL2.microL2(col("a"), col("b")).as("native"),
            hofL2(col("a"), col("b")).as("hof"))
          .collect().forall(r => r.getLong(0) == r.getLong(1))
        // the pqArgmin shape: the expression under a transform lambda
        val inLambda = df.select(
            transform(array(col("b")), c => MicroL2.microL2(col("a"), c)).as("n2"),
            transform(array(col("b")), c => hofL2(col("a"), c)).as("h2"))
          .collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
        direct && inLambda
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
