package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Native cosine Expression: codegen path vs hand-computed fold (same
  * accumulation order ⇒ bit-equal), plus null/empty behavior.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("codegen result bit-equals the sequential reference fold") {
    val rows = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.25f), Array(-0.5f, 0.25f)),
      (Array(1e-4f, 1e4f, 7.7f), Array(1e4f, 1e-4f, -7.7f)))
    val df = rows.toDF("a", "b")
    val got = df.select(CosineSimilarity.cosine(col("a"), col("b"))).as[Double].collect()
    val want = rows.map { case (a, b) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(got.toSeq == want)
  }

  test("null input yields null, not a crash") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val got = df.select(CosineSimilarity.cosine(col("a"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("works over the real embeddings table inside whole-stage codegen") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val self = emb.select(CosineSimilarity.cosine(col("embedding"), col("embedding"))
      .as("c")).as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12)) // cos(x, x) = 1
  }
}
