package graft.functions

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Native functions through plain SQL: after registration every graft
  * expression/aggregate is callable from `spark.sql` like a built-in,
  * and returns the same values as the Column API.
  */
class SqlRegistrationSpec extends SparkSpec {
  import spark.implicits._

  GraftSqlBridge.registerAll(spark)

  test("scalar expressions: cosine, md5_long60, winnow_summary, hyperplane_bucket") {
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val (sqlCos, apiCos) = spark.sql(
      "SELECT cosine(a, b), cosine(a, a) FROM vecs").as[(Double, Double)].collect().head match {
      case (ab, aa) => (ab, aa)
    }
    assert(math.abs(sqlCos -
      Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
        .select(CosineSimilarity.cosine(col("a"), col("b"))).as[Double].collect().head) == 0.0)
    assert(apiCos == 1.0)

    val h = spark.sql("SELECT md5_long60('join')").as[Long].collect().head
    assert(h == Seq("join").toDF("s")
      .select(Md5Long60.md5Long60(col("s"))).as[Long].collect().head)

    val ws = spark.sql(
      "SELECT winnow_summary('the quick brown fox jumps', 4, 8).n_fingerprints")
      .as[Long].collect().head
    assert(ws > 0)

    Seq(Tuple1(Array.fill(64)(1.0f))).toDF("e").createOrReplaceTempView("emb1")
    val b = spark.sql("SELECT hyperplane_bucket(e, 8) FROM emb1").as[Long].collect().head
    assert(b == Seq(Tuple1(Array.fill(64)(1.0f))).toDF("e")
      .select(HyperplaneBucket.hyperplaneBucket(col("e"), 8, 64)).as[Long].collect().head)

    val dp = spark.sql(
      "SELECT dot_product_d(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].collect().head
    assert(dp == 11.0)
    val l2 = spark.sql(
      "SELECT micro_l2(array(3L, 5L), array(1L, 2L))").as[Long].collect().head
    assert(l2 == 13L)
    // adc_sum: lut = [10, 20, 30, 40] with ksub=2, codes (1, 0) ->
    // lut[0*2+1] + lut[1*2+0] = 20 + 30
    val adc = spark.sql(
      "SELECT adc_sum(array(10L, 20L, 30L, 40L), 2, 1L, 0L)")
      .as[Long].collect().head
    assert(adc == 50L)
  }

  test("aggregates: kmv_distinct, topk_pairs and kmin_by_hash from SQL") {
    (1 to 1000).map(i => (i % 7, (i % 40).toLong, (i % 13).toDouble))
      .toDF("g", "id", "s").createOrReplaceTempView("agg_in")
    val kmv = spark.sql(
      "SELECT kmv_distinct(md5_long60(CAST(id AS STRING)) % 2147483647, 64) FROM agg_in")
      .as[Long].collect().head
    assert(kmv == 40L) // under k retained minima -> exact distinct count

    val tk = spark.sql(
      """SELECT g, topk_pairs(s, id, 3) AS tk FROM agg_in GROUP BY g""")
      .selectExpr("g", "tk[0].score", "tk[0].id").as[(Int, Double, Long)].collect()
    assert(tk.length == 7 && tk.forall(_._2 == 12.0)) // max score 12, id tiebreak

    val km = spark.sql(
      "SELECT kmin_by_hash(id, s, 2) AS km FROM agg_in WHERE id >= 5")
      .selectExpr("km[0].h", "km[0].v", "km[1].v").as[(Long, Double, Double)]
      .collect().head
    // (5, 0.0) occurs twice in the input (i = 325, 845) and the sample
    // is a MULTISET, so both copies fill k = 2
    assert(km == ((5L, 0.0, 0.0)))

    val mg = spark.sql(
      "SELECT misra_gries(id % 3, 8) AS mg FROM agg_in")
      .selectExpr("size(mg)", "mg[0].c").as[(Int, Long)].collect().head
    assert(mg._1 == 3 && mg._2 >= 333L) // 3 distinct fit in k: exact counts
  }

  test("bpe_fold_merge from SQL: greedy leftmost scan incl. the chain case") {
    import spark.implicits._
    val out = spark.sql(
      "SELECT bpe_fold_merge(array('a','a','a','a'), 'a', 'a') AS m")
      .as[Seq[String]].collect().head
    assert(out == Seq("aa", "aa"), s"chain must merge greedily: $out")
    val noMatch = spark.sql(
      "SELECT bpe_fold_merge(array('ab','c'), 'b', 'c') AS m")
      .as[Seq[String]].collect().head
    assert(noMatch == Seq("ab", "c"), "no cross-symbol false match")
    val e = intercept[Exception](
      spark.sql("SELECT bpe_fold_merge(array('a'), 'a', id) FROM agg_in"))
    assert(e.getMessage.contains("string literal"), s"got: ${e.getMessage}")
    // null elements are legal through the SQL surface: pass through
    // unmerged (null never equals a merge symbol), no NPE
    val withNull = spark.sql(
      "SELECT bpe_fold_merge(array('a', CAST(NULL AS STRING), 'a', 'b'), 'a', 'b') AS m")
      .collect().head.getSeq[String](0)
    assert(withNull == Seq("a", null, "ab"), s"got: $withNull")
  }

  test("wrong arity raises a descriptive error, not IndexOutOfBounds") {
    val e1 = intercept[Exception](spark.sql("SELECT misra_gries() FROM agg_in"))
    assert(e1.getMessage.contains("misra_gries expects 1 to 2 argument(s)"),
      s"got: ${e1.getMessage}")
    val e2 = intercept[Exception](spark.sql("SELECT misra_gries(id, 8, 9) FROM agg_in"))
    assert(e2.getMessage.contains("got 3"), s"got: ${e2.getMessage}")
    val e3 = intercept[Exception](spark.sql("SELECT cosine(array(1.0f)) AS c"))
    assert(e3.getMessage.contains("cosine expects 2 argument(s)"),
      s"got: ${e3.getMessage}")
  }
}
