package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[Snapshot.diff]] semantics: the four status classes, fingerprint
  * visibility, the multi-column separator, and the loud null-key
  * contract.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("added/removed/changed/unchanged classified from the two snapshots") {
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("k", "t")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("k", "t")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("t"))
      .as[(Long, String, Option[String], Option[String])].collect()
      .map(r => (r._1, r._2)).toSet
    assert(got == Set((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    val fps = Snapshot.diff(oldSnap, newSnap, "k", Seq("t"))
      .as[(Long, String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._3.isDefined, r._4.isDefined))).toMap
    assert(fps(3L) == ((true, false)) && fps(4L) == ((false, true)))
    assert(fps(1L) == ((true, true)))
  }

  test("multi-column fingerprint: separator keeps (ab, c) distinct from (a, bc)") {
    val oldSnap = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val newSnap = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("x", "y"))
      .select("status").as[String].head()
    assert(got == "changed")
  }

  test("null content column fingerprints identically on both sides") {
    val oldSnap = Seq((1L, Option.empty[String], Some("v"))).toDF("k", "x", "y")
    val newSnap = Seq((1L, Option.empty[String], Some("v"))).toDF("k", "x", "y")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("x", "y"))
      .select("status").as[String].head()
    assert(got == "unchanged")
  }

  test("applyLog: latest version wins, delete drops, insert adds, rest pass through") {
    val base = Seq((1L, "keep"), (2L, "update-me"), (3L, "delete-me"),
      (5L, "update-then-delete")).toDF("k", "t")
    val log = Seq(
      (2L, 1L, "U", "v1"), (2L, 2L, "U", "v2"),          // latest U wins
      (3L, 1L, "D", ""),                                  // delete existing
      (4L, 1L, "I", "fresh"),                             // insert new key
      (5L, 1L, "U", "x"), (5L, 2L, "D", ""),              // U then D -> gone
      (9L, 1L, "D", "")                                   // delete absent: no-op
    ).toDF("k", "v", "op", "t")
    val got = Snapshot.applyLog(base, log, "k", "v", "op", Seq("t"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    def md5s(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((md5s("keep"), "base")))
    assert(got(2L) == ((md5s("v2"), "log")))
    assert(got(4L) == ((md5s("fresh"), "log")))
  }

  test("applyLog: unknown op raises loudly") {
    val base = Seq((1L, "a")).toDF("k", "t")
    val log = Seq((1L, 1L, "X", "zap")).toDF("k", "v", "op", "t")
    val ex = intercept[Exception] {
      Snapshot.applyLog(base, log, "k", "v", "op", Seq("t")).collect()
    }
    assert(ex.getMessage.contains("applyLog") ||
      Option(ex.getCause).exists(_.getMessage.contains("applyLog")))
  }

  test("null key raises loudly") {
    val oldSnap = Seq((Option.empty[Long], "t")).toDF("k", "t")
    val newSnap = Seq((Option(1L), "t")).toDF("k", "t")
    val ex = intercept[Exception] {
      Snapshot.diff(oldSnap, newSnap, "k", Seq("t")).collect()
    }
    assert(ex.getMessage.contains("Snapshot.diff") ||
      Option(ex.getCause).exists(_.getMessage.contains("Snapshot.diff")))
  }
}
