package graft.operators

import graft.streaming.SparkSpec

/** [[Graph.pageRankMicro]] against an independent in-memory reference
  * implementing the same integer recurrence — any divergence in the
  * distributed join/agg plumbing (lost contributions, double-counted
  * edges, wrong coalesce) shows up as an exact-integer mismatch. */
class GraphSpec extends SparkSpec {

  /** Reference: same floor-division micro-unit recurrence, driver-side. */
  private def referenceRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contribs = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => (85L * r(s)) / (100L * outdeg(s)) }.sum
      }
      r = nodes.map(n => n -> (150000L + contribs.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("pageRankMicro matches the integer reference on an asymmetric graph") {
    import spark.implicits._
    // a hub (1) with spokes, a chain, and a cycle — asymmetric degrees
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L), (5L, 6L), (6L, 4L))
    val directed = und ++ und.map(_.swap)
    val got = Graph.pageRankMicro(directed.toDF("src", "dst"), "src", "dst", iterations = 5)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == referenceRanks(directed, 5))
  }

  test("hub outranks spokes; ranks are deterministic across reruns") {
    import spark.implicits._
    val star = (2L to 9L).flatMap(i => Seq((1L, i), (i, 1L)))
    val df = star.toDF("src", "dst")
    val a = Graph.pageRankMicro(df, "src", "dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankMicro(df, "src", "dst").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "reruns must be bit-identical")
    assert(a(1L) > a(2L) * 4, "the hub must dominate the spokes")
    assert((2L to 9L).map(a).distinct.size == 1, "symmetric spokes must tie exactly")
  }

  test("shortestHops: bounded BFS on a path, unreached nodes absent") {
    import spark.implicits._
    val path = (1L to 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = Graph.shortestHops(path.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"nodes 5,6 lie beyond 3 hops and must be absent: $got")
  }

  test("shortestHops: multi-source takes the minimum over seeds") {
    import spark.implicits._
    val path = (1L to 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = Graph.shortestHops(path.toDF("src", "dst"), "src", "dst",
        Seq(1L, 6L).toDF("node"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
  }
}
