package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.streaming.SparkSpec

/** Randomized-input properties for the iterative distributed kernels
  * (Components / PageRank / BFS) against independent in-memory
  * references — the kernels whose failure modes are structural (lost
  * edges, double-counted contributions, frontier leaks) and therefore
  * best hunted with adversarial random graphs rather than fixtures.
  * ScalaCheck drives generation/shrinking; each property runs a small
  * number of Spark jobs, so minSuccessfulTests stays modest. */
class IterativeKernelPropertySpec extends SparkSpec {

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    m <- Gen.choose(1, 120)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield es

  private def check(p: Prop, runs: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(runs), p)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    check(Prop.forAll(genEdges) { es =>
      val noLoops = es.filterNot { case (a, b) => a == b }
      // both the adaptive driver finish (default threshold) and the
      // forced distributed star rounds must match the reference
      noLoops.isEmpty || Seq(1000000L, 0L).forall { thr =>
        val got = Components.connectedComponents(
            noLoops.toDF("a", "b"), "a", "b", driverFinishEdges = thr)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == unionFind(noLoops)
      }
    }, runs = 6)
  }

  test("pageRankMicro equals the integer reference on random graphs") {
    import spark.implicits._
    def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val outdeg = edges.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
      val nodes = edges.map(_._1).distinct
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val contribs = edges.groupBy(_._2).map { case (d, g) =>
          d -> g.map { case (s, _) => (85L * r(s)) / (100L * outdeg(s)) }.sum
        }
        r = nodes.map(n => n -> (150000L + contribs.getOrElse(n, 0L))).toMap
      }
      r
    }
    check(Prop.forAll(genEdges) { es =>
      // symmetrize so every node is a source (the operator contract);
      // both the adaptive driver finish and the forced distributed
      // rounds must match the reference
      val sym = (es ++ es.map(_.swap)).distinct
      Seq(1000000L, 0L).forall { thr =>
        val got = Graph.pageRankMicro(sym.toDF("src", "dst"), "src", "dst",
            iterations = 3, driverFinishEdges = thr)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == reference(sym, 3)
      }
    }, runs = 5)
  }

  test("shortestHops equals reference BFS on random graphs") {
    import spark.implicits._
    def referenceBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                     maxHops: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds
      var hop = 1L
      while (hop <= maxHops && frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(dist.contains)
        dist ++= next.map(_ -> hop)
        frontier = next
        hop += 1
      }
      dist
    }
    check(Prop.forAll(genEdges) { es =>
      val seeds = es.map(_._1).distinct.take(2).toSet
      seeds.isEmpty || Seq(1000000L, 0L).forall { thr =>
        val got = Graph.shortestHops(es.toDF("src", "dst"), "src", "dst",
            seeds.toSeq.toDF("node"), maxHops = 3, driverFinishEdges = thr)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == referenceBfs(es, seeds, 3)
      }
    }, runs = 5)
  }
}
