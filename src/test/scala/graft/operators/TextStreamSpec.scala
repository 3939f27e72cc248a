package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SparkSpec

/** Streaming twins of the per-row text ops (VERDICT r5 #5): chunking
  * and PII redaction are narrow projections, so the SAME operator
  * body runs unchanged over a stream — these specs pin that the
  * per-micro-batch output equals the batch output on identical data,
  * across batch boundaries.
  */
class TextStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey " +
      "xray yankee zulu one two three four five six seven eight nine ten"),
    (2L, "short doc"),
    (3L, "call 555-1234 or mail a.user@mail-3.com from host 10.1.2.3 today"))

  test("chunk over a stream equals the batch chunks, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.chunk(in.toDF().toDF("doc_id", "text"), "text", "doc_id",
        chunkSize = 8, stride = 6)
      .writeStream.format("memory").queryName("chks").outputMode("append").start()
    try {
      in.addData(docs(0), docs(1))
      q.processAllAvailable()
      in.addData(docs(2))
      q.processAllAvailable()
      val got = spark.table("chks").collect().map(_.toSeq).toSet
      val want = TextAnalysis.chunk(docs.toDF("doc_id", "text"), "text", "doc_id",
        chunkSize = 8, stride = 6).collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("redactPii over a stream matches the batch scrub byte-for-byte") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.redactPii(in.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("piis").outputMode("append").start()
    try {
      in.addData(docs(0))
      q.processAllAvailable()
      in.addData(docs(2))
      q.processAllAvailable()
      val got = spark.table("piis").collect().map(_.toSeq).toSet
      val want = TextAnalysis.redactPii(docs.filter(d => d._1 != 2L).toDF("doc_id", "text"),
        "text", "doc_id").collect().map(_.toSeq).toSet
      assert(got == want)
      // the planted-PII row actually detected something (non-vacuous)
      val r3 = spark.table("piis").filter("doc_id = 3").head()
      assert(r3.getLong(1) == 1 && r3.getLong(2) == 1 && r3.getLong(3) == 1,
        s"expected one email/phone/ip hit: $r3")
    } finally q.stop()
  }

  test("scoreBackoff streams against a frozen model, equals the batch scores") {
    // the documented LM-gate deployment: model tables trained once on
    // a static corpus, incoming documents scored as a stream — every
    // model join is stream-static, the per-doc agg runs in complete
    // mode; output must equal the batch scorer on identical docs
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq((0L, "the cat sat on the mat"),
      (2L, "the dog sat on the log")).toDF("doc_id", "text")
    val model = TextAnalysis.trainBackoff(train, "text", "doc_id")
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.scoreBackoff(model,
        in.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("bkf").outputMode("complete").start()
    try {
      val d1 = (1L, "the cat sat on the log zebra") // hits + an OOV
      val d3 = (3L, "mat the cat likes dog")        // bigram/unigram backoffs
      in.addData(d1)
      q.processAllAvailable()
      in.addData(d3)
      q.processAllAvailable()
      val got = spark.table("bkf").collect().map(_.toSeq).toSet
      val want = TextAnalysis.scoreBackoff(model,
          Seq(d1, d3).toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(_.toSeq).toSet
      assert(got == want && got.size == 2)
    } finally q.stop()
  }

  test("scoreNaiveBayes streams against a frozen model, equals the batch scores") {
    // the classifier-gate deployment: model trained once on a labeled
    // static corpus, incoming documents classified as a stream — the
    // model join is stream-static, the single per-doc agg runs in
    // complete mode; output must equal the batch scorer
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val train = Seq((0L, "en", "cat cat dog sat"),
      (2L, "fr", "chat chat chien")).toDF("doc_id", "lab", "text")
    val model = TextAnalysis.trainNaiveBayes(train, "text", "lab", "doc_id")
    val in = MemoryStream[(Long, String, String)]
    val q = TextAnalysis.scoreNaiveBayes(model,
        in.toDF().toDF("doc_id", "lab", "text"), "text", "lab", "doc_id")
      .writeStream.format("memory").queryName("nbs").outputMode("complete").start()
    try {
      val d1 = (1L, "en", "cat dog zebra")  // in-vocab + an OOV token
      val d3 = (3L, "fr", "!!!")            // zero tokens: priors alone
      in.addData(d1)
      q.processAllAvailable()
      in.addData(d3)
      q.processAllAvailable()
      val got = spark.table("nbs").collect().map(_.toSeq).toSet
      val want = TextAnalysis.scoreNaiveBayes(model,
          Seq(d1, d3).toDF("doc_id", "lab", "text"), "text", "lab", "doc_id")
        .collect().map(_.toSeq).toSet
      assert(got == want && got.size == 2)
    } finally q.stop()
  }

  test("mooreLewis streams against two frozen models, equals the batch selector") {
    // the data-selection deployment: in-domain and general LMs trained
    // once, the CANDIDATE corpus arrives as a stream — both four-level
    // join chains are stream-static, the single per-doc agg runs in
    // complete mode; selection flags must equal the batch selector
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inDom = Seq((0L, "the cat sat on the mat"),
      (4L, "the cat likes the mat")).toDF("doc_id", "text")
    val gen = Seq((2L, "stock market prices fell again"),
      (6L, "market prices rose on the day")).toDF("doc_id", "text")
    val mi = TextAnalysis.trainBackoff(inDom, "text", "doc_id")
    val mg = TextAnalysis.trainBackoff(gen, "text", "doc_id")
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.mooreLewis(mi, mg,
        in.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("mls").outputMode("complete").start()
    try {
      val d1 = (1L, "the cat sat on the mat again") // in-domain-ish
      val d3 = (3L, "stock market prices fell hard") // general-ish
      in.addData(d1)
      q.processAllAvailable()
      in.addData(d3)
      q.processAllAvailable()
      val got = spark.table("mls").collect().map(_.toSeq).toSet
      val want = TextAnalysis.mooreLewis(mi, mg,
          Seq(d1, d3).toDF("doc_id", "text"), "text", "doc_id")
        .collect().map(_.toSeq).toSet
      assert(got == want && got.size == 2)
      // the flags discriminate on this fixture: d1 selected, d3 not
      val flags = spark.table("mls").collect()
        .map(r => r.getLong(0) -> r.getLong(5)).toMap
      assert(flags == Map(1L -> 1L, 3L -> 0L), flags.toString)
    } finally q.stop()
  }
}
