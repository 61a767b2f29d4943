package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Power-iteration PageRank against hand-computed fixed points. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(nodes: Seq[Int], edges: Seq[(Int, Int, Double)],
      iterations: Int): Map[Int, Double] = {
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst", "w")
    Graph.pageRank(n, "id", e, "src", "dst", "w", iterations = iterations)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
  }

  test("two-node cycle converges to the uniform fixed point") {
    // symmetric 2-cycle: the uniform vector IS the fixed point, so any
    // iteration count returns exactly 0.5 / 0.5
    val r = ranks(Seq(1, 2), Seq((1, 2, 1.0), (2, 1, 1.0)), 7)
    assert(math.abs(r(1) - 0.5) < 1e-12)
    assert(math.abs(r(2) - 0.5) < 1e-12)
  }

  test("one iteration matches the hand-computed update") {
    // 1 -> 2 (only edge); N=3, d=0.85, r0 = 1/3 each:
    //   r1(1) = 0.15/3                 = 0.05
    //   r1(2) = 0.15/3 + 0.85 * (1/3) = 0.33333...
    //   r1(3) = 0.15/3                 = 0.05
    val r = ranks(Seq(1, 2, 3), Seq((1, 2, 1.0)), 1)
    assert(math.abs(r(1) - 0.05) < 1e-12)
    assert(math.abs(r(2) - (0.05 + 0.85 / 3.0)) < 1e-12)
    assert(math.abs(r(3) - 0.05) < 1e-12)
  }

  test("out-weight normalization splits contribution by edge weight") {
    // 1 splits 3:1 between 2 and 3; after one round the receivers get
    // damping * r0 * (0.75 | 0.25) on top of the teleport term
    val r = ranks(Seq(1, 2, 3), Seq((1, 2, 3.0), (1, 3, 1.0)), 1)
    assert(math.abs(r(2) - (0.05 + 0.85 * (1.0 / 3) * 0.75)) < 1e-12)
    assert(math.abs(r(3) - (0.05 + 0.85 * (1.0 / 3) * 0.25)) < 1e-12)
  }

  test("triangle counts: degree-oriented enumeration finds each triangle once") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4};
    // edges given in mixed directions with a duplicate and a self-loop
    val e = Seq((1, 2), (2, 3), (3, 1), (1, 4), (4, 2), (2, 1), (3, 3))
      .toDF("src", "dst")
    val r = Graph.triangleCounts(e, "src", "dst")
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r === Map(1 -> 2L, 2 -> 2L, 3 -> 1L, 4 -> 1L))
  }

  test("shortest hops: frontier BFS settles minimum distance") {
    // 1→2→3→4 chain plus shortcut 1→3; 5 unreachable
    val e = Seq((1, 2), (2, 3), (3, 4), (1, 3), (5, 1)).toDF("src", "dst")
    val src = Seq(1).toDF("nid")
    val r = Graph.shortestHops(e, "src", "dst", src, "nid", maxHops = 3)
      .collect().map(x => x.getInt(0) -> x.getInt(1)).toMap
    assert(r === Map(1 -> 0, 2 -> 1, 3 -> 1, 4 -> 2))
  }

  test("shortest hops: maxHops bounds the wavefront") {
    val e = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val src = Seq(1).toDF("nid")
    val r = Graph.shortestHops(e, "src", "dst", src, "nid", maxHops = 1)
      .collect().map(x => x.getInt(0) -> x.getInt(1)).toMap
    assert(r === Map(1 -> 0, 2 -> 1))
  }

  test("label propagation: two cliques with a bridge settle to two communities") {
    // cliques {1,2,3} and {4,5,6} joined by bridge 3-4; after 3 rounds
    // each clique agrees on its minimum id; isolated 7 keeps its own
    val clique = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
    val n = Seq(1, 2, 3, 4, 5, 6, 7).toDF("id")
    val e = clique.toDF("src", "dst")
    val r = Graph.labelPropagation(n, "id", e, "src", "dst", rounds = 3)
      .collect().map(x => x.getInt(0) -> x.getInt(1)).toMap
    assert(r(7) === 7)
    // labels are identifiers, not members: each clique must agree
    // internally and differ from the other (hand-traced: left settles on
    // 1, right on 3 — the bridge node's round-1 label floods the right)
    assert(r(1) === r(2) && r(2) === r(3))
    assert(r(4) === r(5) && r(5) === r(6))
    assert(r(1) !== r(4))
    // deterministic: rerun must give the identical labeling
    val r2 = Graph.labelPropagation(n, "id", e, "src", "dst", rounds = 3)
      .collect().map(x => x.getInt(0) -> x.getInt(1)).toMap
    assert(r === r2)
  }

  test("triangle counts match naive enumeration on random graphs") {
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 2 + rng.nextInt(9)
      val edges = (for {
        a <- 1 to n; b <- 1 to n
        if a != b && rng.nextDouble() < 0.45
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        // naive reference: count triangles over the canonical undirected set
        val und = edges.map { case (a, b) => (a min b, a max b) }.toSet
        val naive = (for {
          x <- 1 to n; y <- x + 1 to n; z <- y + 1 to n
          if und((x, y)) && und((x, z)) && und((y, z))
        } yield Seq(x, y, z)).flatten
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        assert(got === naive, s"edges=$edges")
      }
    }
  }

  test("shortest hops match Floyd-Warshall on random graphs") {
    val rng = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      val n = 2 + rng.nextInt(7)
      val edges = (for {
        a <- 1 to n; b <- 1 to n
        if a != b && rng.nextDouble() < 0.3
      } yield (a, b)).toSeq
      val inf = Int.MaxValue / 2
      val d = Array.tabulate(n + 1, n + 1)((i, j) => if (i == j) 0 else inf)
      edges.foreach { case (a, b) => d(a)(b) = 1 }
      for (k <- 1 to n; i <- 1 to n; j <- 1 to n)
        if (d(i)(k) + d(k)(j) < d(i)(j)) d(i)(j) = d(i)(k) + d(k)(j)
      val maxHops = n // enough to settle everything reachable
      val expected = (1 to n).collect {
        case v if d(1)(v) <= maxHops => v -> d(1)(v)
      }.toMap
      val e = if (edges.isEmpty) Seq((1, 1)).toDF("src", "dst")
        else edges.toDF("src", "dst")
      val got = Graph.shortestHops(e, "src", "dst",
          Seq(1).toDF("nid"), "nid", maxHops)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got === expected, s"edges=$edges")
    }
  }

  test("nodeSimilarity: neighborhood Jaccard on a hand graph") {
    // N(1)={2,3} N(4)={2,3} N(2)={1,4,5} N(3)={1,4} N(5)={2}
    val e = Seq((1, 2), (1, 3), (4, 2), (4, 3), (2, 5)).toDF("src", "dst")
    val out = Graph.nodeSimilarity(e, "src", "dst", k = 10)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1, 4, 2L, 1000000L),  // identical neighborhoods
      (2, 3, 2L, 666666L),   // 2/(3+2-2)
      (1, 5, 1L, 500000L),   // 1/(2+1-1)
      (4, 5, 1L, 500000L)))
  }

  test("nodeSimilarity: over-cap hub neighbors generate no candidates") {
    // star graph: every leaf's ONLY neighbor is the hub; with the hub
    // over the degree cap no pair survives, instead of a 5-choose-2
    // all-pairs blow-up asserting spurious similarity
    val e = (1 to 5).map(i => (0, i)).toDF("src", "dst")
    assert(Graph.nodeSimilarity(e, "src", "dst", k = 10, maxDegree = 3)
      .count() === 0L)
    // ...and with the cap above the hub degree the leaves all pair up
    assert(Graph.nodeSimilarity(e, "src", "dst", k = 100, maxDegree = 10)
      .count() === 10L)
  }

  test("strongly connected weighted graph conserves total mass") {
    // every node has out-edges -> no dangling leakage: sum stays 1
    val edges = Seq((1, 2, 2.0), (2, 3, 1.0), (3, 1, 5.0), (2, 1, 3.0))
    val r = ranks(Seq(1, 2, 3), edges, 12)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // 3 funnels everything to 1, and 2 sends 3/4 of its mass to 1 too:
    // node 1 must dominate
    assert(r(1) > r(2) && r(1) > r(3))
  }

  test("kCorePeel: isolated nodes fall first, chains peel inward, core survives") {
    import spark.implicits._
    // graph: triangle {1,2,3} (2-core) + tail 3-4-5 + isolated 9
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = graft.operators.Graph.kCorePeel(nodes, "id", edges, "src", "dst",
      k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: 5 (deg 1) and 9 (deg 0); round 2: 4 (its neighbor 5 gone);
    // triangle survives every round
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 2L, 5L -> 1L, 9L -> 1L), out)
  }

  private def hitsScores(nodes: Seq[Int], edges: Seq[(Int, Int, Double)],
      iterations: Int): Map[Int, (Double, Double)] = {
    val out = Graph.hits(nodes.toDF("id"), "id",
      edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iterations = iterations)
    out.collect().map(r => r.getInt(0) ->
      (r.getDouble(1), r.getDouble(2))).toMap
  }

  test("hits: co-citation star — equal hubs, one authority, zeros elsewhere") {
    // 1 -> 3, 2 -> 3: node 3 is the sole authority (a=1), nodes 1 and 2
    // are equal hubs (h=0.5 each after L1 normalization) — this IS the
    // fixed point, so any iteration count returns it exactly
    val r = hitsScores(Seq(1, 2, 3), Seq((1, 3, 1.0), (2, 3, 1.0)), 4)
    assert(math.abs(r(1)._1 - 0.5) < 1e-12 && math.abs(r(2)._1 - 0.5) < 1e-12)
    assert(math.abs(r(3)._2 - 1.0) < 1e-12)
    assert(r(1)._2 === 0.0 && r(2)._2 === 0.0, "no in-edges -> authority 0")
    assert(r(3)._1 === 0.0, "no out-edges -> hub 0")
  }

  test("hits: both score vectors stay L1-normalized; weights skew authority") {
    // 1 -> 2 (w 3), 1 -> 3 (w 1): authority splits 3:1
    val r = hitsScores(Seq(1, 2, 3), Seq((1, 2, 3.0), (1, 3, 1.0)), 3)
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-12, "hub L1")
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-12, "authority L1")
    assert(math.abs(r(2)._2 - 0.75) < 1e-12 && math.abs(r(3)._2 - 0.25) < 1e-12)
  }

  test("hits: empty edge set degrades to all-zero scores, never NaN/NULL") {
    val out = Graph.hits(Seq(1, 2).toDF("id"), "id",
      spark.emptyDataset[(Int, Int, Double)].toDF("src", "dst", "w"),
      "src", "dst", "w", iterations = 2).collect()
    out.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2))
      assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0)
    }
  }
}
