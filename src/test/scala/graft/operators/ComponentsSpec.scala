package graft.operators

import graft.streaming.SparkSpec

/** Large-star/small-star connected components: transitive closure,
  * chain worst case, determinism under partitioning.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  // driverFinishEdges = 0 forces the distributed star rounds — these
  // cases exist to exercise them; the adaptive driver finish has its
  // own equality case below
  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
      edges.toDF("a", "b"), "a", "b", driverFinishEdges = 0L)
      .as[(Long, Long)].collect().toMap

  test("duplicate chain collapses transitively to the minimum id") {
    // A~B, B~C, C~D but no direct A~C/A~D edge — the per-pair view
    // can't pick consistent survivors; the closure can
    val got = cc(Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 8L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  test("long path converges within the round budget (log-round property)") {
    val n = 512L
    val path = (1L until n).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == n)
    assert(got.values.forall(_ == 1L))
  }

  test("self-loops, duplicate and reversed edges are harmless") {
    // a node seen ONLY in a self-loop is a singleton: dropped here,
    // restored by the caller-side left join (see ddComponents)
    val got = cc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("adaptive driver finish equals the distributed rounds exactly") {
    // under the threshold the closure collects + union-finds; the
    // labeling (component = min id) must be identical to the star
    // fixpoint, chains and singleton-loops included
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 8L), (5L, 5L),
      (100L, 90L), (90L, 80L), (80L, 70L))
    val adaptive = Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(adaptive == cc(edges))
  }

  test("result is independent of input partitioning") {
    val edges = (0L until 200L).map(i => (i % 40, i % 40 + 40)) ++
      Seq((39L, 0L), (41L, 40L))
    val base = cc(edges)
    val shuffled = Components.connectedComponents(
      edges.toDF("a", "b").repartition(13), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(base == shuffled)
  }

  test("empty edge list yields an empty assignment") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("spanning-only jaccard edges yield the same components as the full pair set") {
    import org.apache.spark.sql.functions.col
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base + " iota"),
      (10L, "one two three four five six seven eight"),
      (11L, "one two three four five six seven nine"),
      (20L, "totally different words completely unrelated right here now")
    ).toDF("doc_id", "text")
    def comps(spanning: Boolean): Map[Long, Long] = Components.connectedComponents(
      Dedup.ngramJaccard(docs, "text", "doc_id", threshold = 0.7,
        spanningOnly = spanning).select(col("doc_a"), col("doc_b")),
      "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val full = comps(false)
    val span = comps(true)
    assert(full == span)
    assert(full.view.filterKeys(Set(1L, 2L, 3L)).values.toSet == Set(1L))
  }

  test("matches a reference union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(800)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter { case (a, b) => a != b }
    // reference: plain union-find with path compression
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // larger root attaches under smaller, so every set's root stays
      // its minimum element — the same representative Components picks
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    assert(cc(edges) == want)
  }
}
