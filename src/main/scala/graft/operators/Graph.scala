package graft.operators

import graft.spark.Loop
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators over edge-list DataFrames.
  *
  * The reference has no graph tier, but a training-data pipeline at
  * 100 TB does: link graphs for domain-level quality propagation,
  * user–item bipartite graphs for popularity weighting, co-occurrence
  * graphs for near-dup cluster audits. Everything here is expressed as
  * joins + aggregations over an `(src, dst)` edge list — the shape that
  * scales: no adjacency lists in driver memory, no per-vertex RPC, just
  * Catalyst-planned shuffles keyed on vertex id.
  *
  * Determinism: PageRank is computed in FIXED-POINT integer arithmetic
  * (rank mass scaled to `scale` integer units, integer `div` for the
  * per-edge split, damping applied as `(num * x) div den`). Long sums
  * are exact and associative, so the result is bit-identical regardless
  * of partitioning — and an independent single-threaded engine unrolling
  * the same recurrence reproduces it exactly. Double-precision PageRank
  * cannot make that promise (partial-sum order changes the last ulps).
  */
object Graph {

  /** Fixed-point PageRank over a directed edge list.
    *
    * @param edges  DataFrame with string columns `src`, `dst`; parallel
    *               edges contribute multiply (pre-`distinct` if unwanted)
    * @param iterations  power-iteration rounds (fixed count — the
    *                    deterministic contract; convergence-threshold
    *                    stopping would couple the result to float noise)
    * @param scale  total rank mass in integer units (default 1e12: room
    *               for 1e9+ nodes before per-node rank underflows to 0
    *               while staying far from Long overflow under `85 * x`)
    * @param dampNum/dampDen  damping factor as an exact rational (85/100)
    * @return (id STRING, rank LONG) — ranks sum to ≈ scale (floor-division
    *         dust is lost, never created: safe under iteration)
    *
    * Scale shape: per round, ONE join of the node-sized rank frame into
    * the edge list (edges stay put — at 100 TB the edge list is the big
    * side and is never re-shuffled once co-partitioned on `src`) and ONE
    * hash aggregation keyed on `dst` with map-side partials. Lineage is
    * truncated per round (`localCheckpoint`) so the plan stays O(1) deep;
    * the loop runs under [[graft.spark.Loop.pinned]] because the rank
    * frame is node-sized, not edge-sized.
    */
  def pageRankFixedPoint(
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000000L,
      dampNum: Int = 85,
      dampDen: Int = 100): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must be a proper fraction, got $dampNum/$dampDen")
    val spark = edges.sparkSession
    val e = edges.persist() // read 4x below before edgesD caches
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist()
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge list")
    // edge list decorated with out-degree once, up front; re-used
    // (not re-shuffled) every round
    val edgesD = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val init = scale / n
    val base = (scale * (dampDen - dampNum) / dampDen) / n
    var ranks = nodes.withColumn("rank", lit(init))
    Loop.pinned(spark) {
      for (_ <- 1 to iterations) {
        val contribs = edgesD
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), expr("rank div outdeg").as("contrib"))
          .groupBy("id")
          .agg(sum("contrib").as("c"))
        ranks = nodes.join(contribs, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr(s"($dampNum * coalesce(c, cast(0 as bigint))) div $dampDen"))
              .as("rank"))
          .localCheckpoint()
      }
    }
    nodes.unpersist()
    edgesD.unpersist()
    e.unpersist()
    ranks
  }

  /** Out-degree per source vertex: (src, outdeg). */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy("src").agg(count(lit(1)).as("outdeg"))

  /** Minimum-hop BFS distances from `source`, capped at `maxHops`.
    *
    * @param edges   directed edge list (string `src`, `dst`)
    * @param source  start vertex id (hop 0; emitted even if isolated)
    * @param maxHops traversal depth cap — the deterministic contract and
    *                the termination bound (reachability radius audits
    *                rarely need more than a few hops)
    * @return (id STRING, hop INT): every vertex reachable within
    *         `maxHops`, with its exact minimum hop count
    *
    * Frontier expansion, one round per hop: join the (frontier-sized)
    * open set into the edge list, distinct the successors, anti-join
    * away everything already visited. At 100 TB the edge list is the
    * big side and stays put — each round shuffles only frontier- and
    * visited-sized frames keyed on vertex id, with lineage truncated
    * per round (`localCheckpoint`) so the plan depth is O(1), not
    * O(hops). The loop exits as soon as a frontier drains, so the cap
    * is an upper bound, not a fixed cost. Runs under [[Loop.pinned]]
    * (frontier frames are vertex-sized, not edge-sized).
    *
    * Determinism: hop counts are exact integers from a fixed recurrence
    * — bit-identical across partitionings, and reproducible by an
    * independent engine running the same bounded walk (the gr4 oracle
    * unions all ≤`maxHops` walks in a recursive CTE and takes the
    * per-vertex minimum, which is the same function).
    */
  def bfsHops(edges: DataFrame, source: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    // the edge list is re-joined every round: materialize it once (at
    // cluster scale this is the already-persisted/bucketed edge table —
    // the point is the per-round plan must not re-derive it)
    val e = edges.persist()
    var visited = Seq((source, 0)).toDF("id", "hop")
    var frontier = visited.select("id")
    var drained = false
    Loop.pinned(spark) {
      for (h <- 1 to maxHops if !drained) {
        val next = e
          .join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(visited.select("id"), Seq("id"), "left_anti")
          .withColumn("hop", lit(h))
          .localCheckpoint()
        if (next.isEmpty) drained = true
        else {
          visited = visited.unionByName(next).localCheckpoint()
          frontier = next.select("id")
        }
      }
    }
    e.unpersist()
    visited
  }

  /** Synchronous label propagation (community detection), a fixed number
    * of rounds with a deterministic tie-break.
    *
    * Every vertex starts labeled with its own id; each round, a vertex
    * adopts the most frequent label among its in-neighbors, ties broken
    * by the smallest label (binary string order on both engines), and
    * vertices with no in-edges keep their label. The FIXED round count
    * and total tie-break make the result a pure function of the edge
    * list — bit-identical across partitionings and reproducible by an
    * independent engine unrolling the same recurrence (the gr5 oracle).
    * (Classic LPA breaks ties randomly; determinism is worth more to a
    * gated pipeline than the marginal community quality.)
    *
    * Scale shape, per round: one join of the node-sized label frame into
    * the edge list (edges stay put, as in PageRank), one hash
    * aggregation to (vertex, label) counts with map-side partials, and
    * one `min_by` reduction per vertex on the already-aggregated count
    * frame — shuffle rows bounded by distinct (vertex, neighbor-label)
    * pairs, never raw edges. Lineage truncated per round; runs under
    * [[Loop.pinned]].
    *
    * @return (id STRING, label STRING) — the community representative
    *         each vertex converged to after `rounds` rounds
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession
    val e = edges.persist() // re-joined every round; derive once
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().persist()
    var labels = nodes.withColumn("label", col("id"))
    Loop.pinned(spark) {
      for (_ <- 1 to rounds) {
        val adopted = e
          .join(labels.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"), col("label"))
          .agg(count(lit(1)).as("c"))
          .groupBy("id")
          .agg(min_by(col("label"),
            struct((-col("c")).as("nc"), col("label"))).as("adopted"))
        labels = labels.withColumnRenamed("label", "prev")
          .join(adopted, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("adopted"), col("prev")).as("label"))
          .localCheckpoint()
      }
    }
    nodes.unpersist()
    e.unpersist()
    labels
  }

  /** Triangle enumeration over an UNDIRECTED graph given as canonical
    * edges `(a < b)`: returns every (a, b, c) with a < b < c and all
    * three edges present.
    *
    * The classic two-join enumeration: wedges (a–b, b–c) closed by a
    * third equi-join probing (a, c). All joins are equi-joins on vertex
    * ids — no cross product. At scale the input to this should be a
    * PROJECTED graph (e.g. distinct entity pairs pre-aggregated out of
    * the fact table) — projection is where the 100 TB is spent;
    * enumeration runs on the much smaller distinct-edge set, and the
    * canonical `a < b < c` orientation means each triangle is produced
    * exactly once (no ×6 blowup, no post-dedup shuffle).
    */
  def triangles(canonicalEdges: DataFrame): DataFrame = {
    val e1 = canonicalEdges.select(col("a"), col("b"))
    val e2 = canonicalEdges.select(col("a").as("b"), col("b").as("c"))
    val e3 = canonicalEdges.select(col("a"), col("b").as("c"))
    e1.join(e2, "b").join(e3, Seq("a", "c")).select("a", "b", "c")
  }
}
