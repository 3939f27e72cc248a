package graft.operators

import graft.streaming.SparkSpec

/** Hand fixtures for the funnel's strict-order semantics and the
  * retention triangle's cohort/offset arithmetic. */
class EventAnalyticsSpec extends SparkSpec {

  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("funnel: strict order enforced; same-instant tie fails; stages count independently") {
    import spark.implicits._
    val rows = Seq(
      // user 1: full clean funnel
      (1L, "view", t(10)), (1L, "click", t(20)), (1L, "purchase", t(30)),
      // user 2: clicked BEFORE viewing — click stage not reached
      (2L, "click", t(10)), (2L, "view", t(20)),
      // user 3: click at the SAME instant as the first view — strict
      // > fails; the later click qualifies, but purchase precedes it
      (3L, "view", t(10)), (3L, "click", t(10)),
      (3L, "purchase", t(15)), (3L, "click", t(20)),
      // user 4: never viewed
      (4L, "purchase", t(10)),
      // user 5: views only
      (5L, "view", t(10)), (5L, "view", t(50))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(rows, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head
    // views: users 1,2,3,5 → 4; clicks after first view: 1,3 → 2;
    // purchases after that click: only 1 → 1
    assert(got == ((4L, 2L, 1L)), s"got $got")
  }

  test("funnel: a user's earliest qualifying instant wins, not any qualifying one") {
    import spark.implicits._
    // two views: funnel anchors at the FIRST (t=10); the click at
    // t=15 sits after it, so the funnel completes even though the
    // second view (t=40) is later than the click
    val rows = Seq(
      (1L, "view", t(10)), (1L, "view", t(40)), (1L, "click", t(15))
    ).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(rows, "user_id", "event_type", "ts",
        Seq("view", "click")).as[(Long, Long)].collect().head
    assert(got == ((1L, 1L)), s"got $got")
  }

  test("associationRules: lift ranks the exclusive pair above the ubiquitous one") {
    import spark.implicits._
    // items 1,2 co-occur in exactly their 2 baskets and NOWHERE else
    // (lift = N·2/(2·2) = high); item 9 is in every basket, so pairs
    // with 9 have lift ≈ 1; duplicates inside a basket collapse
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 9L), (1L, 9L),
      (2L, 1L), (2L, 2L), (2L, 9L),
      (3L, 3L), (3L, 9L),
      (4L, 4L), (4L, 9L),
      (5L, 5L), (5L, 9L),
      (6L, 6L), (6L, 9L),
      (7L, 7L), (7L, 9L),
      (8L, 8L), (8L, 9L)
    ).toDF("order_id", "part_id")
    val got = EventAnalytics.associationRules(baskets, "order_id", "part_id",
        minCount = 2L, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // N=8. (1,2): cab=2, ca=cb=2 → lift = 8·2·1e6/(2·2) div = 4e6;
    // support = 2e6/8 = 250000; conf = 1e6. (1,9)/(2,9): cab=2, ca=2,
    // cb=8 → lift 1e6 exactly. minCount=2 kills every other pair.
    assert(got.head == ((1L, 2L, 2L, 250000L, 1000000L, 4000000L)), s"got $got")
    assert(got.tail.forall(_._6 == 1000000L), s"hub pairs must sit at lift 1e6: $got")
    assert(got.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 9L), (2L, 9L)), s"got $got")
  }

  test("retention: cohorts anchor at first active day, offsets count distinct users") {
    import spark.implicits._
    def day(d: Long, sec: Long = 0L) = t(d * 86400L + sec)
    val rows = Seq(
      // cohort day 0: users 1 and 2; user 1 returns day 1 (twice —
      // still one (user, day) row) and day 3; user 2 returns day 1
      (1L, day(0)), (1L, day(1)), (1L, day(1, 60)), (1L, day(3)),
      (2L, day(0, 100)), (2L, day(1)),
      // cohort day 2: user 3, never returns
      (3L, day(2))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retention(rows, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L), (0L, 1L, 2L), (0L, 3L, 1L),
      (2L, 0L, 1L)), s"got $got")
  }
}
