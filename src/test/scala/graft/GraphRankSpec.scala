package graft

import graft.ops.ext.GraphRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphRankSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ranksOf(
      nodes: Seq[Long], edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    graft.engine.Caching.scoped {
      GraphRank.pageRankOf(
        nodes.toDF("id"), edges.toDF("src", "dst"), nodes.length.toLong, rounds)
        .as[(Long, Long)].collect().toMap
    }

  test("pagerank round matches hand-computed integer arithmetic on a 2-node graph") {
    val m = GraphRank.Mass
    val r0 = m / 2
    val base = (3L * r0) / 20L
    // symmetric pair, degree 1 each: every round r' = base + (17*r)/20
    var expected = r0
    for (_ <- 1 to 3) expected = base + (17L * expected) / 20L
    val got = ranksOf(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), rounds = 3)
    assert(got == Map(1L -> expected, 2L -> expected))
  }

  test("hub node outranks leaves; isolated node gets exactly the teleport base") {
    // star: 2 is the hub of 1,3,4; node 9 is isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 9L)
    val spokes = Seq(1L, 3L, 4L)
    val edges = spokes.flatMap(s => Seq((s, 2L), (2L, s)))
    val got = ranksOf(nodes, edges, rounds = 3)
    val base = (3L * (GraphRank.Mass / nodes.length)) / 20L
    assert(spokes.forall(s => got(2L) > got(s)), s"hub must outrank leaves: $got")
    assert(got(9L) == base, "no in-edges → teleport mass only")
  }

  private def trianglesOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    graft.engine.Caching.scoped {
      GraphRank.trianglesOf(edges.toDF("u", "v")).as[(Long, Long)].collect().toMap
    }

  test("triangles: K4 has 4 triangles, every node in 3; pendant edges add none") {
    // complete graph on {1,2,3,4} (u<v pairs) + pendant node 9 off node 1
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val got = trianglesOf(k4 :+ (1L, 9L))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 triangle counts wrong: $got")
  }

  test("triangles: two triangles sharing an edge count the shared nodes twice") {
    // {1,2,3} and {2,3,4}: nodes 2,3 sit in both
    val got = trianglesOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles: bloom-prefiltered closing probe matches brute force on a random graph") {
    // deterministic LCG graph, dense enough that the wedge stream is
    // thousands of rows and the r18 closing-edge Bloom filter (no false
    // negatives; false positives fall out of the join) does real work
    var s = 12345L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); s >>> 33 }
    val edges = (1 to 1200).map { _ =>
      val a = nxt() % 60; val b = nxt() % 60
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 < p._2).distinct
    val adj = edges.toSet
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if adj((a, b)) && adj((a, c)) && adj((b, c))
    } { expected(a) += 1; expected(b) += 1; expected(c) += 1 }
    assert(expected.values.sum > 100, "fixture too sparse to exercise the filter")
    assert(trianglesOf(edges) == expected.toMap)
  }

  test("triangles: star graph (hot hub) yields zero triangles, bounded wedges") {
    // a 50-spoke star has no triangles; degree orientation points every
    // edge AWAY from the spokes into the hub, so the hub generates no
    // wedge pairs at all (the O(√m) out-degree bound in action)
    val star = (1L to 50L).map(s => (s, 100L))
    assert(trianglesOf(star).isEmpty)
  }

  test("fixture graph: mass is conserved up to truncation loss; hubs rank high") {
    val df = GraphRank.pageRank(spark, Sf)
    val ranks = df.as[(Long, Long)].collect()
    val n = ranks.length.toLong
    val total = ranks.map(_._2).sum
    // each round truncates < 1 quantum per division: per-edge contrib,
    // per-node damping + base — bound the loss generously
    val edges = 2L * 100000L
    assert(total <= GraphRank.Mass)
    assert(total > GraphRank.Mass - GraphRank.Rounds * (edges + 2 * n + 20),
      s"mass leak: $total of ${GraphRank.Mass}")
    // supplier nodes (the high-fan-in side of the bipartite graph)
    // should dominate the top ranks
    val top10 = ranks.sortBy(-_._2).take(10)
    assert(top10.count(_._1 >= GraphRank.NodeOff) == 10,
      s"expected supplier hubs on top: ${top10.mkString(",")}")
  }
}
