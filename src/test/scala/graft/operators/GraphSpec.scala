package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BFS semantics vs the recursive CTEs of graph_loader.go:402-464:
  * bounded depth, cycle safety, min-distance dedup, undirected option.
  * Graph: a→b→c→d→a (cycle), c→e, isolated f, hub h→{x,y,z}.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("c", "e"),
    ("h", "x"), ("h", "y"), ("h", "z"))
    .toDF("from_id", "to_id")

  private def distances(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  // Every scenario asserts BOTH execution paths: the driver-contracted
  // endgame (default gate — these graphs are tiny) and the distributed
  // iterative loop (localEdgeLimit = 0 disables the gate).
  private def reachBoth(src: Seq[String], maxHops: Int,
      undirected: Boolean): Seq[Map[String, Int]] =
    Seq(Long.MaxValue, 0L).map { lim =>
      distances(Graph.reachFrom(
        if (undirected)
          edges.unionByName(edges.select(col("to_id").as("from_id"),
            col("from_id").as("to_id")))
        else edges,
        src.toDF("id"), maxHops, undirected = false, localEdgeLimit = lim))
    }

  test("directed reach with cycle termination (local + distributed)") {
    val Seq(local, dist) = reachBoth(Seq("a"), 10, undirected = false)
    assert(local == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 3))
    assert(dist == local)
  }

  test("maxHops bound (reference depth ≤ 10 → here 2)") {
    val Seq(local, dist) = reachBoth(Seq("a"), 2, undirected = false)
    assert(local == Map("a" -> 0, "b" -> 1, "c" -> 2))
    assert(dist == local)
  }

  test("shortest path length and unreachable") {
    assert(Graph.shortestPathLength(edges, "a", "e") == Some(3))
    assert(Graph.shortestPathLength(edges, "a", "f") == None)
    assert(Graph.shortestPathLength(edges, "x", "a") == None)
    assert(Graph.shortestPathLength(edges, "d", "c", maxDepth = 2) == None)
    assert(Graph.shortestPathLength(edges, "d", "c", maxDepth = 3) == Some(3))
  }

  test("undirected k-hop neighborhood keeps min distance") {
    val d = distances(Graph.neighborhood(edges, "e", 2))
    assert(d == Map("e" -> 0, "c" -> 1, "b" -> 2, "d" -> 2))
    val Seq(local, dist) = reachBoth(Seq("e"), 2, undirected = true)
    assert(local == d && dist == d)
  }

  test("multi-source reach takes min over sources (local + distributed)") {
    val Seq(local, dist) = reachBoth(Seq("a", "c"), 10, undirected = false)
    assert(local == Map("a" -> 0, "c" -> 0, "b" -> 1, "d" -> 1, "e" -> 1))
    assert(dist == local)
  }

  test("pairReach keeps the (src, dst) binding on both execution paths") {
    // a→b→c→d→a cycle: from a and c simultaneously, each source's
    // distances must stay separate (reachFrom would merge them)
    def run(lim: Long): Set[(String, String, Int)] =
      Graph.pairReach(edges, Seq("a", "c").toDF("id"), 10,
        localEdgeLimit = lim)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
        .toSet
    val local = run(Long.MaxValue)
    val expected = Set(
      ("a", "a", 0), ("a", "b", 1), ("a", "c", 2), ("a", "d", 3), ("a", "e", 3),
      ("c", "c", 0), ("c", "d", 1), ("c", "e", 1), ("c", "a", 2), ("c", "b", 3))
    assert(local == expected)
    assert(run(0L) == local, "distributed pairReach disagrees with endgame")
    // depth bound truncates per source
    assert(Graph.pairReach(edges, Seq("a").toDF("id"), 1).count() == 2)
    // duplicate seeds collapse (one BFS per distinct source)
    assert(Graph.pairReach(edges, Seq("a", "a").toDF("id"), 2)
      .filter(col("src") === "a" && col("id") === "a").count() == 1)
  }

  test("reachPaths: lexicographic-min tie-break agrees across both paths") {
    // two equal-length routes into d (a→b→d, a→c→d): min path is via b;
    // cycle edge d→a must not re-enter; e only via the longer chain
    val pe = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "a"), ("d", "e")).toDF("from_id", "to_id")
    def run(lim: Long): Map[String, (Seq[String], Int)] =
      Graph.reachPaths(pe, Seq("a"), 10, localEdgeLimit = lim).collect()
        .map(r => r.getString(0) ->
          ((r.getSeq[String](1), r.getInt(2)))).toMap
    val local = run(Long.MaxValue)
    assert(local("d") == (Seq("a", "b", "d"), 2))
    assert(local("e") == (Seq("a", "b", "d", "e"), 3))
    assert(local("a") == (Seq("a"), 0))
    assert(run(0L) == local)
  }

  test("1-hop dependencies/dependents join vertices") {
    val vertices = Seq(("a", "A"), ("b", "B"), ("x", "X"), ("h", "H"))
      .toDF("id", "name")
    val dep = Graph.dependencies(edges, vertices, "a")
      .select("name").as[String].collect().toSet
    assert(dep == Set("B"))
    val deps = Graph.dependents(edges, vertices, "x")
      .select("name").as[String].collect().toSet
    assert(deps == Set("H"))
  }

  test("pageRank: hub accumulates mass, fixed-point exact, partition-stable") {
    // star: five leaves all point at the hub; one chain hangs off a leaf
    val star = (Seq("l1", "l2", "l3", "l4", "l5").map(_ -> "hub") :+
      ("c" -> "l1")).toDF("from_id", "to_id")
    val pr = Graph.pageRank(star, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr.size == 7)
    val hub = pr("hub")
    assert(pr.filterNot(_._1 == "hub").values.forall(_ < hub),
      s"hub must rank highest: $pr")
    assert(pr("l1") > pr("l2"), "l1 has an in-edge and must outrank bare leaves")
    assert(pr("l2") == pr("l3") && pr("l3") == pr("l4") && pr("l4") == pr("l5"))
    // total mass bounded by the fixed-point scale (no redistribution)
    assert(pr.values.forall(v => v > 0) && pr.values.sum <= 1000000000000L)
    // bit-exact under repartitioning: integer arithmetic has no sum-order
    val pr2 = Graph.pageRank(star.repartition(7), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr2 == pr)
    // driver endgame == distributed loop, bit for bit
    val dist = Graph.pageRank(star, iters = 10, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == pr)
  }

  test("triangles: per-vertex counts via degree orientation") {
    // K4 on {a,b,c,d} (4 triangles, each vertex in 3), one pendant edge
    // d-e (no triangle), a duplicate + reversed edge, and a self-loop —
    // the last three must not change any count
    val k4 = for {
      Seq(x, y) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (x, y)
    val e = (k4 ++ Seq(("d", "e"), ("b", "a"), ("a", "b"), ("c", "c")))
      .toDF("from_id", "to_id")
    val out = Graph.triangles(e)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), out)
  }

  test("triangles: wedge apex is unique per triangle (no double count)") {
    // a 5-cycle plus one chord creates exactly one triangle
    val e = Seq(("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("5", "1"),
      ("1", "3")).toDF("from_id", "to_id")
    val out = Graph.triangles(e)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1" -> 1L, "2" -> 1L, "3" -> 1L), out)
  }

  test("sssp: min-cost path beats fewer-hop path, cycle-safe, multi-source") {
    // s→t direct costs 10; s→a→b→t costs 1+1+1=3. Cycle a→b→a must
    // terminate. Second source z reaches t cheaper still (z→t = 2).
    val we = Seq(
      ("s", "t", 10L), ("s", "a", 1L), ("a", "b", 1L), ("b", "t", 1L),
      ("b", "a", 1L), ("z", "t", 2L))
      .toDF("from_id", "to_id", "w")
    val got = Graph.sssp(we, Seq("s").toDF("id"), 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s" -> 0L, "a" -> 1L, "b" -> 2L, "t" -> 3L), got)
    val multi = Graph.sssp(we, Seq("s", "z").toDF("id"), 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(multi("t") == 2L && multi("z") == 0L && multi("a") == 1L, multi)
    // bounded-walk semantics: with 1 round only direct edges relax
    val one = Graph.sssp(we, Seq("s").toDF("id"), 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("s" -> 0L, "t" -> 10L, "a" -> 1L), one)
    // partition-stable: bigint sums carry no order sensitivity
    val rep = Graph.sssp(we.repartition(5), Seq("s").toDF("id"), 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == got)
    // driver endgame == distributed loop (including the 1-round bound)
    assert(Graph.sssp(we, Seq("s").toDF("id"), 6, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == got)
    assert(Graph.sssp(we, Seq("s").toDF("id"), 1, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == one)
  }

  test("labelPropagation: two cliques bridge-linked settle to two communities") {
    // clique {a1,a2,a3} + clique {z1,z2,z3}, one bridge a3-z1
    val edges = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("z1", "z2"), ("z1", "z3"), ("z2", "z3"),
      ("a3", "z1"))
      .toDF("from_id", "to_id")
    val out = Graph.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // round-by-round the min label 'a1' floods its clique; the z-clique
    // keeps its own minimum except the bridge pulls z1 toward the a-side
    // frequency; what matters: a-clique uniform, z2/z3 agree, and the
    // result is deterministic under repartitioning
    assert(out("a1") == out("a2") && out("a2") == out("a3"), out)
    assert(out("z2") == out("z3"), out)
    val rep = Graph.labelPropagation(edges.repartition(7), rounds = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep == out)
    // isolated vertex keeps its own label
    val iso = Graph.labelPropagation(
      edges.unionByName(Seq(("q9", "q9")).toDF("from_id", "to_id")), 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(iso("q9") == "q9")
    // driver endgame == distributed loop (same rounds, same ties)
    val dist = Graph.labelPropagation(edges, rounds = 4, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dist == out)
  }

  test("labelPropagation: NULL endpoint — endgame and distributed agree") {
    // a NULL vertex never equi-joins its neighbors' labels distributed,
    // so its label must stay frozen on BOTH paths
    val edges = Seq(
      (Option("a"), Option("b")), (Option("b"), Option("c")),
      (Option.empty[String], Option("a")), (Option("c"), Option.empty[String]))
      .toDF("from_id", "to_id")
    def toMapN(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0)) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val end = toMapN(Graph.labelPropagation(edges, rounds = 3))
    val dist = toMapN(Graph.labelPropagation(edges, rounds = 3, localEdgeLimit = 0))
    assert(end == dist, s"endgame $end != distributed $dist")
    assert(end.get(null).contains(null), end)
  }

  test("sssp: NULL-weight edges relax on neither path") {
    // x is reachable ONLY via a null-weight edge: both paths must omit
    // it rather than one emitting (x, NULL)
    val we = Seq(
      ("s", "a", Option(2L)), ("a", "x", Option.empty[Long]),
      ("s", "b", Option(5L)))
      .toDF("from_id", "to_id", "w")
    def toMapN(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val end = toMapN(Graph.sssp(we, Seq("s").toDF("id"), 4))
    val dist = toMapN(Graph.sssp(we, Seq("s").toDF("id"), 4, localEdgeLimit = 0))
    assert(end == dist, s"endgame $end != distributed $dist")
    assert(!end.contains("x"), end)
  }

  test("kCore peels below-floor vertices; fixed rounds match manual peel") {
    // triangle a-b-c (2-core) with pendant chain c-d-e (peels away)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e")).toDF("from_id", "to_id")
    val core = Graph.kCore(edges, k = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k=3 on the triangle: everything peels
    assert(Graph.kCore(edges, k = 3, rounds = 3).count() == 0)
    // one round only: e (deg 1) drops, d survives round 1 at deg 2
    val one = Graph.kCore(edges, k = 2, rounds = 1)
      .collect().map(_.getString(0)).toSet
    assert(one == Set("a", "b", "c"))
    // driver endgame == distributed loop (duplicate/reversed edges dedup
    // identically on both paths)
    val dup = edges.unionByName(Seq(("b", "a")).toDF("from_id", "to_id"))
    val local = Graph.kCore(dup, k = 2, rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dist = Graph.kCore(dup, k = 2, rounds = 3, localEdgeLimit = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(local == dist && local == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }
}
