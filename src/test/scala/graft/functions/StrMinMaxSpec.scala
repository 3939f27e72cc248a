package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[StrMinMax]] vs built-in min/max (same values, hash-friendly
  * plan), buffer-aliasing safety across many rows/partitions, null
  * semantics, grouped use, and the SQL registration.
  */
class StrMinMaxSpec extends SparkSpec {
  import spark.implicits._

  test("equals built-in min/max across partitions (no buffer aliasing)") {
    val rows = (0 until 5000).map(i => s"tok_${(i * 2654435761L) % 977}%")
    val df = rows.toDF("s").repartition(7)
    val got = df.agg(StrMinMax.strMinMax(col("s")).as("mm"))
      .select("mm.min_s", "mm.max_s").as[(String, String)].head()
    val want = df.agg(min(col("s")), max(col("s"))).as[(String, String)].head()
    assert(got == want)
  }

  test("nulls ignored; all-null group yields null struct") {
    val df = Seq((1, Some("b")), (1, None), (1, Some("a")), (2, None))
      .toDF("g", "s")
    val got = df.groupBy(col("g")).agg(StrMinMax.strMinMax(col("s")).as("mm"))
      .select(col("g"), col("mm.min_s"), col("mm.max_s"))
      .as[(Int, Option[String], Option[String])].collect().toMap2
    assert(got(1) == ((Some("a"), Some("b"))))
    assert(got(2) == ((None, None)))
  }

  test("grouped plan is hash-aggregated, not sort-aggregated") {
    val df = (0 until 1000).map(i => (i % 13, s"v$i")).toDF("g", "s")
    val plan = df.groupBy(col("g")).agg(StrMinMax.strMinMax(col("s")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), plan.take(500))
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("non-string input fails analysis, not runtime") {
    val ex = intercept[Exception] {
      Seq(1L, 2L).toDF("v").agg(StrMinMax.strMinMax(col("v"))).collect()
    }
    assert(ex.getMessage.contains("str_min_max") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"), ex.getMessage.take(200))
  }

  test("callable from SQL after registration") {
    org.apache.spark.sql.GraftSqlBridge.registerAll(spark)
    Seq("m", "a", "z").toDF("s").createOrReplaceTempView("smm_in")
    val got = spark.sql("SELECT str_min_max(s).min_s, str_min_max(s).max_s FROM smm_in")
      .as[(String, String)].head()
    assert(got == (("a", "z")))
  }

  private implicit class M(rows: Array[(Int, Option[String], Option[String])]) {
    def toMap2: Map[Int, (Option[String], Option[String])] =
      rows.map { case (g, a, b) => (g, (a, b)) }.toMap
  }
}
