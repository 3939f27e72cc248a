package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Native 60-bit md5 hash vs the exact Column chain it replaced —
  * the chain is also the DuckDB oracle's literal formula, so equality
  * here is equality with every oracle twin that hashes.
  */
class Md5Long60Spec extends SparkSpec {
  import spark.implicits._

  private def convChain(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("equals the conv(substring(md5)) chain, incl. multibyte and edge strings") {
    val rows = Seq("", "a", "join", "the quick brown fox", "héllo wörld",
      "ça déraille — à minuit", "\t controlled", "0", "2147483647",
      "😀 supplementary plane") ++ (0 until 200).map(i => s"tok_$i")
    val df = rows.toDF("s")
    val got = df.select(Md5Long60.md5Long60(col("s")).as("a"),
      convChain(col("s")).as("b")).as[(Long, Long)].collect()
    got.foreach { case (a, b) => assert(a == b) }
    // and through the % P31 reduction used by every dedup front end
    val mods = df.select(Hashing.md5Mod31(col("s")).as("a"),
      (convChain(col("s")) % 2147483647L).as("b")).as[(Long, Long)].collect()
    mods.foreach { case (a, b) => assert(a == b) }
  }

  test("works inside a higher-order transform lambda (streaming signature path)") {
    val df = Seq(Seq("select", "from", "where")).toDF("toks")
    val got = df.select(transform(col("toks"),
      t => Hashing.md5Mod31(t)).as("hs")).as[Seq[Long]].collect().head
    val want = Seq("select", "from", "where").map { s =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483647L
    }
    assert(got == want)
  }

  test("null input yields null") {
    val got = Seq(Option.empty[String]).toDF("s")
      .select(Md5Long60.md5Long60(col("s"))).collect()
    assert(got.head.isNullAt(0))
  }
}
