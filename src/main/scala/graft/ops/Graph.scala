package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists.
  *
  * The connected-components half of the family lives in
  * [[Dedup.clusterLabels]] (dedup clustering is its consumer); this object
  * holds the rank-propagation half. Both follow the same distributed
  * shape: the graph is an edge DataFrame, every iteration is an edge-grain
  * equi-join + aggregate (never an adjacency matrix), and the driver holds
  * nothing but the loop counter.
  *
  * CLUSTER CAVEAT on the per-round `localCheckpoint`s below (r20
  * verdict): local checkpoints store blocks unreplicated on executor
  * storage and sever lineage, so on a multi-executor cluster a lost
  * executor fails the job (no lineage to recompute from). That is the
  * right trade on local[*] and for short jobs; a long cluster run should
  * swap the round-boundary checkpoints for reliable `checkpoint()` (HDFS/
  * object-store backed) or periodic writes of the round state.
  *
  * STORAGE-ACCUMULATION CAVEAT (r21 review): each round's pinned frames
  * become unreferenced at the next iteration but their MEMORY_AND_DISK
  * blocks are reclaimed only when the driver GCs the RDD handle and
  * ContextCleaner runs — a deep contraction can hold many stale
  * round-table copies concurrently with live state (they evict to disk
  * under memory pressure, LRU-first, so correctness is unaffected; the
  * cost is storage churn). Spark's public Dataset API offers no direct
  * unpersist for a lazily checkpointed frame; a cluster deployment that
  * hits this should rely on `spark.cleaner.periodicGC.interval` (default
  * 30 min — lower it for round loops) or the reliable-checkpoint swap
  * above, which replaces the pinned blocks outright.
  */
object Graph {

  /** Damped PageRank (Page/Brin 1998) over a weighted edge list, fixed
    * iteration count, INTEGER-EXACT: ranks are longs scaled by `scale`,
    * damping is the rational `dampNum/dampDen`, and every per-edge
    * contribution is floored independently —
    *
    *   contrib(u→v) = ⌊dampNum · R(u) · w(u,v) / (dampDen · W(u))⌋,
    *   R'(v) = ⌊(dampDen−dampNum) · scale / (dampDen · N)⌋ + Σ contrib
    *
    * — so the sum is order-independent and the trajectory reproduces
    * bit-for-bit on any engine (the [[Knn.kmeansFit]] exact-replay
    * stance). Floor-vs-exact drift is < 1/scale per edge per iteration —
    * measurement noise for ranking, determinism for verification.
    *
    * Dangling nodes (no out-edges) contribute nothing — their mass decays
    * to the base term rather than redistributing, a documented convention
    * both engines share (redistribution would add an all-nodes broadcast
    * term per iteration for no verification value).
    *
    * Overflow headroom: dampNum·R·w must fit a LONG. R is bounded by
    * ~scale (total mass ≤ scale + N·base); with scale = 10⁹ and dampNum
    * < 10², edge weights up to ~10⁸ are safe. Normalize heavier weight
    * columns before calling (ranks depend only on weight RATIOS per
    * source, so any per-source normalization is rank-neutral).
    *
    * Scale shape: each iteration is one equi-join of edges against the
    * current rank table on the source key plus one dst-grain aggregate —
    * the canonical shuffle pair every distributed PageRank pays. The
    * out-weight table is computed once; nodes/out-weights/ranks are all
    * node-grain (vocab-sized for word graphs, page-sized for web graphs),
    * only the edge join scales with the graph. `iterations` chains the
    * plan `iterations` deep — checkpoint between calls at web scale.
    *
    * Output: (node, rank_scaled LONG) — rank = rank_scaled/scale. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iterations: Int,
               dampNum: Int = 85, dampDen: Int = 100,
               scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1: $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < $dampNum < $dampDen")
    // Materialize the edge list once (localCheckpoint): each iteration
    // joins against it, and without truncation Spark's lazy recomputation
    // re-derives the upstream edge pipeline (e.g. a corpus bigram count)
    // once per iteration. The same persist-the-graph move every iterative
    // graph engine makes (GraphX caches its edge RDD).
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"),
      col(weightCol).cast("long").as("_w"))
      .localCheckpoint(true)
    val nodes = e.select(col("_src").as("node"))
      .unionByName(e.select(col("_dst").as("node"))).distinct()
    val nRow = broadcast(nodes.agg(count(lit(1)).as("_N")))
    val outW = e.groupBy(col("_src")).agg(sum(col("_w")).as("_wout"))
    val base = expr(s"(${dampDen - dampNum}L * ${scale}L) div (${dampDen}L * _N)")
    var ranks = nodes.crossJoin(nRow)
      .select(col("node"), expr(s"${scale}L div _N").as("_r"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "_src"), Seq("_src"))
        .join(outW, Seq("_src"))
        .select(col("_dst"),
          expr(s"(${dampNum}L * _r * _w) div (${dampDen}L * _wout)").as("_c"))
        .groupBy(col("_dst")).agg(sum(col("_c")).as("_contrib"))
      ranks = nodes.crossJoin(nRow)
        .join(contribs.withColumnRenamed("_dst", "node"), Seq("node"), "left_outer")
        .select(col("node"), (base + coalesce(col("_contrib"), lit(0L))).as("_r"))
    }
    ranks.select(col("node"), col("_r").as("rank_scaled"))
  }

  /** Per-node triangle counts over an undirected graph, by the
    * degree-ordered wedge algorithm (Schank & Wagner 2005 /
    * Suri & Vassilvitskii's MapReduce formulation): orient every edge
    * from its lower-rank endpoint to its higher-rank endpoint under the
    * total order (degree, node), enumerate wedges b ← a → c with
    * rank(b) < rank(c) at the LOW-rank apex, and close each wedge
    * against the oriented edge set. Each triangle is found exactly once
    * (its minimum-rank vertex is the apex), and the wedge count is
    * Σ_v outdeg(v)² with outdeg ≤ O(√m) on any graph — the
    * high-degree-hub explosion (Σ deg² on a star = n²) never happens,
    * which is the entire reason to pay the degree ranking.
    *
    * Input edges may be directed/duplicated/self-looped; they normalize
    * to a distinct undirected simple edge set first. Everything is two
    * aggregations and three equi-joins on node keys — no cartesian, no
    * driver state. Output: (node, n_tri LONG), one row per node in at
    * least one triangle; each triangle credits all three vertices. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("n")).unionByName(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by (degree, node): rank(x) < rank(y) ⇔ (d_x, x) < (d_y, y)
    val ranked = und
      .join(deg.select(col("n").as("a"), col("d").as("_da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("_db")), Seq("b"))
      .select(
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("_e"))
      .select(col("_e.lo").as("lo"), col("_e.hi").as("hi"))
    val wedges = ranked.select(col("lo").as("apex"), col("hi").as("x"))
      .join(ranked.select(col("lo").as("apex"), col("hi").as("y")), Seq("apex"))
      .filter(col("x") < col("y"))
    // a wedge closes iff (x, y) is an oriented edge in EITHER direction —
    // x < y lexicographically, but the orientation is by rank
    val tris = wedges.join(
      ranked.select(col("lo").as("x"), col("hi").as("y"))
        .unionByName(ranked.select(col("hi").as("x"), col("lo").as("y"))),
      Seq("x", "y"))
    tris
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** Fixed-round k-core peeling (Seidman 1983; the Batagelj-Zaveršnik
    * peel distributed): repeatedly delete nodes of degree < k, `rounds`
    * times. With rounds ≥ the peel depth this IS the k-core — the
    * maximal subgraph where every node keeps ≥ k neighbors — and a
    * fixed round count keeps the operator a pure deterministic function
    * (same-shaped plan every run, and an oracle can replay it as an
    * unrolled CTE chain rather than a fixpoint loop). Each round is one
    * degree aggregate + one semi-join per endpoint — edge-grain shuffles,
    * node-grain state, no driver data.
    *
    * Input normalizes like [[triangleCounts]] (undirected, simple).
    * Output: (node, degree LONG) over the surviving subgraph. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be ≥ 1: $k")
    require(rounds >= 1, s"rounds must be ≥ 1: $rounds")
    // Checkpoint the surviving edge set every round (localCheckpoint —
    // the iterative-op stance of pageRank/bpeMerges): each round's plan
    // references the previous edge set three times (degrees + two
    // semi-joins), so an UN-CHECKPOINTED lazy chain would re-evaluate the
    // upstream edge build 3^rounds times. The LAZY localCheckpoint below
    // still pins one shared materialization per round (all three readers
    // hit the same persisted RDD once the final action computes it) —
    // laziness only moves WHEN rounds materialize (inside the single
    // final action instead of one blocking driver job per round, r20).
    // The peel state is edge-grain and SHRINKS monotonically — exactly
    // what an iterative engine persists.
    var und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // lazy (r20): rounds then materialize inside the single final
      // action as one job — an EAGER checkpoint here ran one blocking
      // driver job per round for the same work and the same lineage
      // truncation
      .localCheckpoint(false)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    for (_ <- 1 to rounds) {
      val keep = degrees(und).filter(col("d") >= k).select(col("n"))
      und = und
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .localCheckpoint(false)
    }
    degrees(und).select(col("n").as("node"), col("d").as("degree"))
  }

  /** Fixed-round synchronous label propagation (Raghavan et al. 2007) —
    * the modularity-style community member of the family next to
    * components (connectivity), k-core (density) and triangles (local
    * clustering). Every node starts labeled with itself; each round,
    * every node adopts the most frequent label among its neighbors,
    * ties broken by the SMALLEST label — the deterministic tie-break
    * that makes the whole trajectory replayable (classic LPA breaks
    * ties randomly; a fixed rule costs nothing and buys an exact
    * unrolled-CTE oracle, the [[pageRank]] stance). Synchronous update:
    * round r reads only round r−1's labels, so the result is
    * partition-count- and order-independent.
    *
    * Scale shape per round: one edge-grain equi-join of the symmetrized
    * edge set against the node-grain label table, one
    * (node, neighbor-label) count aggregate — bounded by Σ deg(v) — and
    * one node-grain `max_by(label, (count, −label))` aggregate for the
    * argmax (a second partial+final hash aggregate over rows already
    * clustered by node — no sort, no window, and the tie-break rides in
    * the comparison key; a per-node rank window here would add a full
    * sort per round for the same answer). Label state localCheckpoints
    * per round (the kCore/bfs lineage stance — lazy chaining would
    * replay the upstream edge build 2^rounds times).
    *
    * Input normalizes like [[triangleCounts]] (undirected, simple);
    * isolated nodes don't exist in an edge-derived node set. Output:
    * (node, community) — community ids are node values, so two nodes
    * share a community iff they carry the same label after `rounds`. */
  def lpaCommunities(edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be ≥ 1: $rounds")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = und.select(col("a").as("_u"), col("b").as("_v"))
      .unionByName(und.select(col("b").as("_u"), col("a").as("_v")))
      // lazy (r20, the kCore rationale): one final-action job instead of
      // one blocking job per round
      .localCheckpoint(false)
    var labels = sym.select(col("_u").as("node")).distinct()
      .withColumn("_lab", col("node"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val counts = sym
        .join(labels.select(col("node").as("_v"), col("_lab").as("_nl")), Seq("_v"))
        .groupBy(col("_u"), col("_nl")).agg(count(lit(1)).as("_c"))
      // argmax by (count DESC, label ASC) as min_by over (−count, label):
      // label types are generic (word graphs carry strings), so the
      // tie-break negates the COUNT, never the label
      labels = counts
        .groupBy(col("_u"))
        .agg(min_by(col("_nl"),
          struct((-col("_c")).as("_negc"), col("_nl").as("_l"))).as("_lab"))
        .select(col("_u").as("node"), col("_lab"))
        .localCheckpoint(false)
    }
    labels.select(col("node"), col("_lab").as("community"))
  }

  /** Multi-source BFS hop distance — "how many hops from the seed set is
    * each node" (influence radius, fraud-ring proximity, the graph
    * feature next to [[pageRank]]'s centrality and [[kCore]]'s density).
    * Level-synchronous frontier expansion over the undirected edge set:
    * each hop is ONE equi-join of the edge table against the (shrinking)
    * frontier plus an anti-join against the settled set — never a
    * transitive-closure pair explosion, and state is node-grain (one
    * (id, dist) row per reached node). Frontier and settled sets
    * localCheckpoint per level (the kCore/clusterLabels lineage stance).
    * Stops at `maxHops` or an empty frontier, whichever first; unreached
    * nodes are absent from the output (distance ∞). */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be ≥ 0: $maxHops")
    val und = edges
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .unionByName(edges.select(col(dstCol).as("_s"), col(srcCol).as("_d")))
      .distinct()
      .localCheckpoint(true)
    var settled = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("dist", lit(0))
      // lazy (r20): settled is only READ by the next hop's anti-join and
      // the final output — an eager checkpoint here was one extra
      // blocking job per hop; `next` stays EAGER because isEmpty is the
      // loop's termination probe
      .localCheckpoint(false)
    var frontier = settled.select(col("id"))
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      val next = und
        .join(frontier.withColumnRenamed("id", "_s"), Seq("_s"), "left_semi")
        .select(col("_d").as("id")).distinct()
        .join(settled.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        settled = settled
          .unionByName(next.withColumn("dist", lit(hop)))
          .localCheckpoint(false)
        frontier = next
        hop += 1
      }
    }
    settled
  }
  /** Connected components by TWO-PHASE STAR contraction (Kiveris et al.
    * 2014, "Connected Components in MapReduce and Beyond" — public
    * algorithm): alternating large-star / small-star rounds over a
    * canonical (big → small) edge set until fixpoint. Semantics are
    * identical to [[Dedup.clusterLabels]] — (id, cluster_id) with
    * cluster_id = the minimum id reachable through any pair chain, one
    * row per id appearing in `pairs` — but the round count is
    * O(log²) in the worst case REGARDLESS of component diameter, where
    * min-label propagation pays O(diameter)-ish rounds. This is the
    * scale form for long-chain components (web-graph-shaped near-dup
    * chains: page A ~ page B ~ page C … with no short-cut pairs), the
    * one place label propagation's round count can blow up at 100 TB.
    *
    * Per round (both stars): one symmetric-neighborhood union, one
    * map-side-combined `min` aggregate, one equi-join back, one
    * `distinct` — all edge-grain, nothing driver-side but the loop
    * counter and the convergence counts. Late rounds concentrate a
    * component's edges onto its center id; that hot join key is
    * 1:1-joinable against the unique-per-src min table, so AQE's skew
    * split handles partition imbalance (no pair amplification exists
    * anywhere — emitted rows ≤ input rows per star).
    *
    * Convergence check is EXACT, not probabilistic: the round output is
    * accepted as final iff it has the same row count as the previous
    * round's edge set AND their union-distinct count equals it (new ⊆
    * old ∧ |new| = |old| ⇒ sets equal). A fixpoint of small∘large is
    * provably a forest of stars pointing at component minima, so the
    * first unchanged round is the answer.
    *
    * Input contract mirrors [[Dedup.clusterLabels]]: columns `id_a`,
    * `id_b`; self-pairs label themselves; ids absent from `pairs` are
    * absent from the output. */
  def componentsStar(pairs: DataFrame, maxRounds: Int = 50): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be ≥ 1: $maxRounds")
    val ids = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .distinct()
      .localCheckpoint(false)
    // canonical star-edge set: (src, dst) with src > dst, no self-loops
    var e = pairs
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    var eCount = e.count()
    var converged = eCount == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      // LARGE-STAR: every node v links its LARGER neighbors to
      // m(v) = min(Γ(v) ∪ {v}). Emitted (u, m) always has u > v ≥ m,
      // so the (big, small) invariant is preserved with no self-loops.
      val nbrs = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = nbrs.groupBy(col("src"))
        .agg(min(col("dst")).as("_m"))
        .select(col("src"), least(col("_m"), col("src")).as("_m"))
      // No distinct here (r20 §2.4): duplicates cannot change mins2's
      // per-src MIN, and `small` dedupes at round end. But `large` has
      // TWO consumers (the mins2 aggregate and the small-star join), and
      // the r20 distinct removal also removed the exchange ReuseExchange
      // was deduping across them — without it the nbrs⋈mins subtree runs
      // TWICE per round. The lazy localCheckpoint here pins ONE
      // materialization per round with no dedup exchange at all (r21
      // §2.4; duplicate volume stays bounded by the nbrs row count).
      // r21 three-way A/B (serialized, same box, min-of-3 each):
      //   r19 form (distinct)   star 4.26  incr 6.87  neardup 3.82
      //   r20 form (neither)    star 4.64  incr 5.49  neardup 3.92
      //   r21 form (checkpoint) star 3.63  incr 5.56  neardup 3.45
      // — the checkpoint form wins or ties every query; the r20
      // clean-close "regression" on q_incremental_components (4.06 →
      // 5.54 s) was host variance, not the distinct removal (on this box
      // the r19 form is the SLOWEST of the three for that query). Its
      // remaining floor is round count × per-stage scheduling, which
      // shrinks with neither variant (split-chain rounds carry
      // near-trivial `large` tables).
      val large = nbrs.join(mins, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("_m").as("dst"))
        .localCheckpoint(false)
      // SMALL-STAR: every node v re-links its SMALLER neighborhood
      // Γ⁻(v) (all of it, by the invariant) plus itself to
      // m = min(Γ⁻(v)); emitted pairs keep first > second since
      // u, v > m strictly.
      val mins2 = large.groupBy(col("src")).agg(min(col("dst")).as("_m"))
      val small = large.join(mins2, Seq("src"))
        .filter(col("dst") =!= col("_m"))
        .select(col("dst").as("src"), col("_m").as("dst"))
        .unionByName(mins2.select(col("src"), col("_m").as("dst")))
        .distinct()
        .localCheckpoint(false)
      val cNew = small.count()
      converged = cNew == eCount &&
        small.unionByName(e).distinct().count() == eCount
      e = small
      eCount = cNew
    }
    // convergence is the documented correctness contract — exhausting the
    // round cap without reaching the fixpoint means the labels are
    // truncated mid-contraction, and silence here would hand the caller
    // wrong components (r15 ADVICE)
    if (!converged)
      throw new IllegalStateException(
        s"componentsStar did not converge within maxRounds=$maxRounds " +
          s"(edge set still ${eCount} rows and changing); raise maxRounds " +
          "— rounds needed grow O(log n) in component size")
    // stars: members carry their center; centers (and self-pair-only
    // ids) have no outgoing edge and label themselves
    ids.join(e.select(col("src").as("id"), col("dst").as("_c")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("_c"), col("id")).as("cluster_id"))
  }

  /** INCREMENTAL connected components — the continuous-ingest form of
    * [[componentsStar]] (the [[Dedup.incrementalDedup]] stance applied to
    * clustering): a prior run's labels plus a DELTA pair batch yield the
    * updated labels WITHOUT rescanning the old pair set. Sound because a
    * label row (id, cluster_id) asserts exactly the connectivity the old
    * pairs proved — the label set IS a star-edge compression of the old
    * graph — so contracting (labels ∪ delta) reproduces the components
    * of (old pairs ∪ delta) exactly. Work per batch: node-grain (the
    * standing labels) + delta-grain, times O(log) star rounds; labels of
    * ids the delta never touches come through round 1 unchanged. */
  def incrementalComponents(labels: DataFrame, newPairs: DataFrame,
                            maxRounds: Int = 50): DataFrame =
    // lazy checkpoint (r21 §2.4): componentsStar consumes its pair input
    // TWICE (the ids distinct and the canonical edge build) — without
    // the pin, the standing-labels plan (itself the first contraction's
    // output join) replays per consumer
    componentsStar(
      labels.select(col("id").as("id_a"), col("cluster_id").as("id_b"))
        .unionByName(newPairs.select(col("id_a"), col("id_b")))
        .localCheckpoint(false),
      maxRounds)

}
