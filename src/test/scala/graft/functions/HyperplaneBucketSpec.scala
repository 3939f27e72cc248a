package graft.functions

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.SparkSpec

/** Native sign-LSH bucket loop vs the literal Column tree it replaced
  * — the tree is also the shape the DuckDB oracle inlines, so equality
  * here is equality with the lshBuckets oracle CTE.
  */
class HyperplaneBucketSpec extends SparkSpec {
  import spark.implicits._

  /** The former Column form: left-associated element_at sum per bit. */
  private def columnTree(embCol: String, nBits: Int, dim: Int) =
    (0 until nBits).map { b =>
      val proj = (0 until dim).map(d =>
        element_at(col(embCol), d + 1).cast("double") *
          lit(Similarity.hyperplaneSign(b, d).toDouble)).reduce(_ + _)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("equals the literal Column tree over the real embeddings table") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    for (nBits <- Seq(4, 7, 13)) {
      val diff = emb.select(
        HyperplaneBucket.hyperplaneBucket(col("embedding"), nBits, 64).as("a"),
        columnTree("embedding", nBits, 64).as("b"))
        .filter(col("a") =!= col("b") || col("a").isNull).count()
      assert(diff == 0, s"nBits=$nBits")
    }
  }

  test("boundary-exact on sign flips (proj == 0 stays 0-bit on both paths)") {
    // one vector per quadrant of the first two hyperplanes, plus an
    // all-zero vector whose projections are exactly 0.0 on every plane
    val vecs = Seq(
      Array.fill(64)(1.0f), Array.fill(64)(-1.0f), Array.fill(64)(0.0f),
      Array.tabulate(64)(d => if (d % 2 == 0) 2.5f else -2.5f))
    val df = vecs.toDF("embedding")
    val got = df.select(
      HyperplaneBucket.hyperplaneBucket(col("embedding"), 8, 64).as("a"),
      columnTree("embedding", 8, 64).as("b")).as[(Long, Long)].collect()
    got.foreach { case (a, b) => assert(a == b) }
  }

  test("short or null arrays yield null, not garbage") {
    val df = Seq(Some(Array(1.0f, 2.0f)), None).toDF("embedding")
    val got = df.select(
      HyperplaneBucket.hyperplaneBucket(col("embedding"), 4, 64)).collect()
    assert(got.forall(_.isNullAt(0)))
  }
}
