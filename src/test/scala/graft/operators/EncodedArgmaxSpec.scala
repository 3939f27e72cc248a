package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[EncodedArgmax]] equals the struct-argmax form it replaced (same
  * score-then-id tiebreak), and the domain guards fail LOUDLY instead
  * of silently wrapping — the contract that lets the packed long
  * replace the SortAggregate-forcing struct buffer safely. */
class EncodedArgmaxSpec extends SparkSpec {
  import spark.implicits._

  test("max/min encodings match the struct argmax on random groups") {
    val rnd = new scala.util.Random(1297)
    val rows = Seq.fill(400)((rnd.nextInt(7), rnd.nextInt(50).toLong,
      rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "score", "id")
      .groupBy(col("g"), col("score"), col("id")).agg(count(lit(1))) // dedup-ish mix
      .select(col("g"), col("score"), col("id"))
    val viaStructMax = df.groupBy(col("g"))
      .agg(max(struct(col("score"), (-col("id")).as("neg"), col("id").as("i"))).as("m"))
      .select(col("g"), col("m.score"), col("m.i"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val viaEncMax = df.groupBy(col("g"))
      .agg(max(EncodedArgmax.maxScoreMinId(col("score"), col("id"))).as("e"))
      .select(col("g"), EncodedArgmax.decodeScore(col("e")),
        EncodedArgmax.decodeMaxId(col("e")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaEncMax == viaStructMax)
    val viaStructMin = df.groupBy(col("g"))
      .agg(min(struct(col("score"), col("id"))).as("m"))
      .select(col("g"), col("m.score"), col("m.id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val viaEncMin = df.groupBy(col("g"))
      .agg(min(EncodedArgmax.minScoreMinId(col("score"), col("id"))).as("e"))
      .select(col("g"), EncodedArgmax.decodeScore(col("e")),
        EncodedArgmax.decodeMinId(col("e")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaEncMin == viaStructMin)
  }

  test("domain guards fail loudly, never wrap") {
    def boom(score: Long, id: Long): String = {
      val ex = intercept[Exception] {
        Seq((score, id)).toDF("s", "i")
          .select(EncodedArgmax.maxScoreMinId(col("s"), col("i"))).collect()
      }
      ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    }
    assert(boom(-1L, 0L).contains("outside encodable"), "negative score")
    assert(boom(1L << 31, 0L).contains("outside encodable"), "score >= 2^31")
    assert(boom(0L, -5L).contains("outside encodable"), "negative id")
    assert(boom(0L, 1L << 32).contains("outside encodable"), "id >= 2^32")
    // null score/id raise too (ADVICE r10): a silent null encoding
    // would DROP the row from the argmax where the struct form ranked it
    def boomNull(nullScore: Boolean): String = {
      val df = Seq((Option.when(!nullScore)(1L), Option.when(nullScore)(1L)))
        .toDF("s", "i")
      val ex = intercept[Exception] {
        df.select(EncodedArgmax.maxScoreMinId(col("s"), col("i"))).collect()
      }
      ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    }
    assert(boomNull(nullScore = true).contains("is NULL"), "null score")
    assert(boomNull(nullScore = false).contains("is NULL"), "null id")
    // boundary values encode fine
    val ok = Seq(((1L << 31) - 1, (1L << 32) - 1)).toDF("s", "i")
      .select(EncodedArgmax.decodeScore(
          EncodedArgmax.maxScoreMinId(col("s"), col("i"))).as("sc"),
        EncodedArgmax.decodeMaxId(
          EncodedArgmax.maxScoreMinId(col("s"), col("i"))).as("id"))
      .collect().head
    assert(ok.getLong(0) == (1L << 31) - 1 && ok.getLong(1) == (1L << 32) - 1)
  }
}
