package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Local reference power iteration over an adjacency map — the
    * hand-checkable ground truth the distributed loop must reproduce.
    */
  private def localPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double, redistribute: Boolean): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val out = e.groupBy(_._1).map { case (s, es) => (s, es.size) }
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = if (redistribute)
        nodes.filterNot(out.contains).map(r).sum else 0.0
      val in = e.groupBy(_._2).map { case (t, es) =>
        (t, es.map { case (s, _) => r(s) / out(s) }.sum)
      }
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (in.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
      redistribute: Boolean): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters,
        damping = 0.85, redistributeDangling = redistribute)
      .as[(Long, Double)].collect().toMap

  test("pageRank matches the local power iteration on a hand graph") {
    // A→B, A→C, B→C, C→A: classic 3-node digraph, no dangling nodes
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    for (iters <- Seq(1, 3, 5)) {
      val want = localPageRank(edges, iters, 0.85, redistribute = false)
      val got = run(edges, iters, redistribute = false)
      assert(got.keySet == want.keySet)
      for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12,
        s"iters=$iters node=$k got=${got(k)} want=$v")
    }
  }

  test("mass is conserved on a graph with no dangling nodes") {
    // symmetric graph: every node has an out-edge, total rank stays 1
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = e0 ++ e0.map(_.swap)
    val total = run(edges, 4, redistribute = false).values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"total=$total")
  }

  test("dangling redistribution conserves mass where the plain rule leaks") {
    // node 3 is a sink (no out-edge): without redistribution its rank
    // leaks each pass; with it the total stays exactly 1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val leaked = run(edges, 3, redistribute = false).values.sum
    val kept = run(edges, 3, redistribute = true).values.sum
    assert(leaked < 1.0 - 1e-6, s"expected leak, total=$leaked")
    assert(math.abs(kept - 1.0) < 1e-9, s"total=$kept")
    // and the redistributed ranks match the local reference exactly
    val want = localPageRank(edges, 3, 0.85, redistribute = true)
    val got = run(edges, 3, redistribute = true)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-12,
      s"node=$k got=${got(k)} want=$v")
  }

  test("both modes agree when no node dangles") {
    val e0 = Seq((1L, 2L), (2L, 5L), (5L, 1L), (2L, 1L), (5L, 2L))
    val plain = run(e0, 3, redistribute = false)
    val strict = run(e0, 3, redistribute = true)
    for ((k, v) <- plain)
      assert(math.abs(strict(k) - v) < 1e-12, s"node=$k $v vs ${strict(k)}")
  }

  test("duplicate edges do not double-count contributions") {
    val once = run(Seq((1L, 2L), (2L, 1L)), 2, redistribute = false)
    val dup = run(Seq((1L, 2L), (1L, 2L), (2L, 1L)), 2, redistribute = false)
    for ((k, v) <- once) assert(math.abs(dup(k) - v) < 1e-12)
  }

  test("personalizedPageRank: uniform seeds equal classic pageRank exactly") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val allNodes = Seq(1L, 2L, 3L).toDF("node")
    val classic = run(edges, 3, redistribute = false)
    val seeded = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", Some(allNodes), iters = 3)
      .as[(Long, Double)].collect().toMap
    for ((k, v) <- classic)
      assert(math.abs(seeded(k) - v) < 1e-12, s"node=$k")
  }

  test("personalizedPageRank concentrates trust around the seed") {
    // chain 1→2→3→4 symmetrized; seed {1}: the seed holds the most trust
    // and the far end the least (strict per-hop monotonicity does NOT
    // hold at small iteration counts — trust sloshes along a chain — so
    // the exact check is the local-reference comparison below)
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = e0 ++ e0.map(_.swap)
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", Some(Seq(1L).toDF("node")), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == got.values.max && got(4L) == got.values.min,
      got.toString)
    // local reference with the seeded teleport vector
    val nodes = Seq(1L, 2L, 3L, 4L)
    val out = edges.groupBy(_._1).map { case (s, es) => (s, es.size) }
    val t = nodes.map(v => v -> (if (v == 1L) 1.0 else 0.0)).toMap
    var r = t
    for (_ <- 1 to 4) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        (d, es.map { case (s, _) => r(s) / out(s) }.sum)
      }
      r = nodes.map(v => v -> (0.15 * t(v) + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    for ((k, v) <- r) assert(math.abs(got(k) - v) < 1e-12, s"node=$k")
    // mass conserved (symmetric graph, Σt = 1)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("personalizedPageRank: seeds outside the graph are rejected") {
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(Seq((1L, 2L)).toDF("src", "dst"),
        "src", "dst", Some(Seq(99L).toDF("node")), iters = 2)
    }
  }

  test("hits matches a local mutual-reinforcement reference on a bipartite graph") {
    // hubs 1,2,3 → authorities 10,11: node 1 points at both authorities
    // (best hub); authority 10 has the most in-links (best authority)
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L))
    val got = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    // local reference: same un-normalized passes, normalize at the end
    val srcs = edges.map(_._1).distinct
    var h = srcs.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      a = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => h(s) }.sum
      }
      h = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map { case (_, d) => a(d) }.sum
      }
    }
    val nh = math.sqrt(h.values.map(x => x * x).sum)
    val na = math.sqrt(a.values.map(x => x * x).sum)
    for ((k, v) <- h) assert(math.abs(got(k)._1 - v / nh) < 1e-12, s"hub $k")
    for ((k, v) <- a) assert(math.abs(got(k)._2 - v / na) < 1e-12, s"auth $k")
    // bipartite: pure hubs have auth 0, pure authorities hub 0
    assert(got(1L)._2 === 0.0 && got(10L)._1 === 0.0)
    // the broad buyer is the best hub, the popular supplier the best authority
    assert(got(1L)._1 === got.values.map(_._1).max)
    assert(got(10L)._2 === got.values.map(_._2).max)
    // output is L2-normalized on both axes
    assert(math.abs(got.values.map(v => v._1 * v._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(v => v._2 * v._2).sum - 1.0) < 1e-9)
  }

  test("hits: reversing every edge swaps which side carries rank mass") {
    // exact hub/auth value swap does NOT hold at finite iteration counts
    // (the all-ones start seeds the source side only), but the AXES swap:
    // former pure hubs become pure authorities and vice versa
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    val rev = Graph.hits(edges.map(_.swap).toDF("src", "dst"), "src", "dst",
        iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(rev(1L)._1 === 0.0 && rev(1L)._2 > 0.0) // 1 is now a pure authority
    assert(rev(10L)._2 === 0.0 && rev(10L)._1 > 0.0) // 10 now a pure hub
    assert(rev(10L)._1 === rev.values.map(_._1).max) // in-degree-2 node leads
  }

  test("pageRank rejects an empty graph and bad iteration counts") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
        .count()
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", iters = 0)
    }
  }

  test("maxPropagate: score is seed times decay^distance along the best path") {
    // chain 1-2-3-4 (symmetric) + isolated 5; seed at node 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 1.0), (2L, 0.0), (3L, 0.0), (4L, 0.0), (5L, 0.0))
      .toDF("node", "score")
    val got2 = Graph.maxPropagate(edges, seeds, iters = 2, decay = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(got2 === Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.25, 4L -> 0.0, 5L -> 0.0))
    // a third hop reaches node 4; seeds never decay in place
    val got3 = Graph.maxPropagate(edges, seeds, iters = 3, decay = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(got3 === Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.25, 4L -> 0.125, 5L -> 0.0))
  }

  test("maxPropagate takes the max over converging paths, not the sum") {
    // two seeds both adjacent to node 3: score(3) must be 0.5, not 1.0
    val und = Seq((1L, 3L), (2L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 1.0), (2L, 1.0), (3L, 0.0)).toDF("node", "score")
    val got = Graph.maxPropagate(edges, seeds, iters = 2, decay = 0.5)
      .as[(Long, Double)].collect().toMap
    assert(got(3L) === 0.5)
    // and a cycle must not amplify: 1 and 2 stay at their seed value
    assert(got(1L) === 1.0 && got(2L) === 1.0)
  }

  test("kCore peels to the 2-core; bounded rounds expose the intermediate survivors") {
    // 4-clique {1,2,3,4} + pendant chain 1-5-6 + isolated edge 7-8:
    // peel 1 drops 6,7,8; peel 2 drops 5 (its degree fell to 1);
    // peel 3 is a no-op (fixpoint) -> the clique with degree 3 each
    val edges = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)) ++
      Seq((1L, 5L), (5L, 6L), (7L, 8L))
    val core = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // rounds = 1 stops mid-peel: 5 survives the first round (degree 2)
    // and reports its degree WITHIN the surviving subgraph (only 1 left)
    val one = Graph.kCore(edges.toDF("src", "dst"), "src", "dst",
        k = 2, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L))
  }

  test("triangleStats: K4 census, path graph, duplicate/reversed edge hygiene") {
    // K4 on nodes 1-4 with every edge ALSO given reversed and one twice:
    // dedup to 6 edges, 4 triangles, wedges = 4 * C(3,2) = 12, cc = 1.0
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val r1 = Graph.triangleStats((k4 ++ Seq((1L, 2L))).toDF("src", "dst"))
      .collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      == ((4L, 6L, 4L, 12L)))
    assert(r1.getDouble(4) == 1.0)
    // path 1-2-3-4: 0 triangles, wedges 2 (centers 2 and 3), cc 0
    val r2 = Graph.triangleStats(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")).collect().head
    assert((r2.getLong(2), r2.getLong(3), r2.getDouble(4)) == ((0L, 2L, 0.0)))
    // single edge: no wedge → null coefficient, not NaN
    val r3 = Graph.triangleStats(Seq((1L, 2L)).toDF("src", "dst"))
      .collect().head
    assert(r3.getLong(3) == 0L && r3.isNullAt(4))
  }
}
