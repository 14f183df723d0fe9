package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Correctness of the large-star/small-star connected-components loop
  * behind d07 — cluster labels must equal the component minimum under
  * transitive closure, not just direct pairs.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(spark, edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph collapses to one cluster labeled by its minimum") {
    // 1-2, 2-3, 3-4: (1,4) are never a direct pair but share a component
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate labels; duplicates and reversed edges collapse") {
    val labels = cc(Seq((10L, 7L), (7L, 10L), (10L, 7L), (20L, 21L), (22L, 21L)))
    assert(labels === Map(7L -> 7L, 10L -> 7L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain with shuffled ids converges to the global minimum") {
    // a 300-node path whose ids are NOT in path order — the worst case
    // for naive min propagation (O(diameter) rounds); the star
    // algorithm must still resolve every node to the component min
    val perm = new scala.util.Random(7).shuffle((0 until 300).map(_.toLong + 1000L))
    val edges = perm.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
    val labels = cc(edges)
    val minId = perm.min
    assert(labels.size === 300)
    assert(labels.values.forall(_ == minId))
  }

  test("self-loops and an empty edge list are handled") {
    assert(cc(Seq((5L, 5L))) === Map(5L -> 5L))
    assert(cc(Seq.empty) === Map.empty)
  }

  test("random graphs: star-contraction labels equal brute-force union-find") {
    // the fixtures cover engineered shapes; this pits the distributed
    // algorithm against a trivially-correct sequential oracle on
    // arbitrary graphs (self-loops, multi-edges, many components)
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val nNodes = 5 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(60)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      // sequential union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(n => n -> find(n)).toMap
        .map { case (n, r) =>
          // label = component MINIMUM, which union-by-min maintains
          n -> r
        }
      val got = cc(edges)
      assert(got == expected, s"trial $trial: $edges")
    }
  }

  test("adversarial 1e5-edge chain + max-hub star converge correctly") {
    import spark.implicits._
    // chain 0-1-...-50000: diameter 50k forces the full O(log n) round
    // count; naive propagation would need 50k rounds and trip the cap.
    val n = 50000L
    val chain = (0L until n).map(i => (i, i + 1))
    // star whose HUB is the component MAX: every canonical edge is
    // (spoke, hub), so small-star's per-v neighborhood for the hub is
    // the whole component — the exact giant-partition regime the
    // two-phase minimum exists for (a window formulation would buffer
    // all 50k rows in one task).
    val hub = 2000000L
    val star = (0L until 49999L).map(i => (1000000L + i, hub))
    // twoPhaseMinEdges = 0 forces the giant-component two-phase-minimum
    // path the whole way down — the code 100 TB inputs run
    val labels = Dedup.connectedComponents(
      spark, (chain ++ star).toDF("u", "v"), twoPhaseMinEdges = 0L)
      .groupBy($"cluster_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // two components: the chain labeled 0 (50001 nodes), the star
    // labeled by its minimum spoke (49999 spokes + hub)
    assert(labels == Set((0L, n + 1), (1000000L, 50000L)))
  }

  test("two-phase and window star paths agree on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)(
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).toDF("u", "v")
    val win = Dedup.connectedComponents(spark, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val two = Dedup.connectedComponents(spark, edges, twoPhaseMinEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(win == two)
  }

  test("d07 labels are transitively consistent with d04 pairs") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val labels = Dedup.queries("d07_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = Dedup.queries("d04_ngram_jaccard")(spark, dir)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // every paired doc is labeled, paired docs share a label, and the
    // label is a member's id that can reach itself
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"pair ($a,$b) split across clusters")
    }
    labels.foreach { case (doc, lab) =>
      assert(lab <= doc)
      assert(labels(lab) === lab, s"cluster label $lab is not its own root")
    }
  }
}
