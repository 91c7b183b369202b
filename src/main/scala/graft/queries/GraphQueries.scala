package graft.queries

import graft.Tables
import graft.operators.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-operator pack: PageRank / degree stats / triangle enumeration
  * over the customer–supplier interaction graph derived from the fact
  * tables.
  *
  * A corpus pipeline needs the graph tier for domain-authority weighting
  * (PageRank over the link graph), popularity/degree audits, and
  * community structure checks — none of which the reference has, all of
  * which run on exactly this edge-list shape at 100 TB.
  *
  * Oracle strategy: PageRank is fixed-point integer arithmetic
  * ([[graft.operators.Graph.pageRankFixedPoint]]) so the DuckDB oracle
  * can unroll the identical recurrence as chained CTEs and match
  * bit-for-bit — the same unrolled-oracle trick the BPE trainer (t24)
  * uses for its iterative loop.
  */
object GraphQueries {

  /** The interaction graph: one directed edge per distinct
    * (customer, supplier) trading pair, in BOTH directions (symmetric —
    * every node has out-degree ≥ 1, so no dangling-mass handling is
    * needed). Node ids are namespaced ("c123" / "s45") since the two key
    * spaces overlap.
    */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
    val cs = pairs.select(
      concat(lit("c"), col("c").cast("string")).as("src"),
      concat(lit("s"), col("s").cast("string")).as("dst"))
    val sc = pairs.select(
      concat(lit("s"), col("s").cast("string")).as("src"),
      concat(lit("c"), col("c").cast("string")).as("dst"))
    cs.unionByName(sc)
  }

  /** The edge list MATERIALIZED once per testdata generation
    * (fingerprint-keyed scratch parquet, marker-last like every other
    * persisted scratch state): five graph queries consume the same
    * derived graph, so the fact-table join + distinct runs once, not
    * once per query — exactly how a production pipeline materializes
    * its edge table before the graph tier runs. Falls back to the
    * inline derivation if the scratch dir is unwritable. */
  private def tradeEdgesCached(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val suffix = graft.storage.Scratch.fingerprint(d).take(8)
    val dir = s"${sys.props("java.io.tmpdir")}/graft_trade_edges_$suffix"
    val marker = Paths.get(s"$dir/_complete")
    try {
      if (!Files.exists(marker)) {
        tradeEdges(s, d).write.mode("overwrite").parquet(s"$dir/edges")
        Files.createFile(marker) // last: a torn build rebuilds
      }
      s.read.parquet(s"$dir/edges")
    } catch {
      case _: java.io.IOException => tradeEdges(s, d)
    }
  }

  private val edgesCte =
    """pairs AS (
         SELECT DISTINCT o_custkey AS c, l_suppkey AS s
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       edges AS (
         SELECT 'c' || c AS src, 's' || s AS dst FROM pairs
         UNION ALL
         SELECT 's' || s AS src, 'c' || c AS dst FROM pairs)"""

  /** Unrolled fixed-point PageRank recurrence as DuckDB CTEs — must stay
    * in lockstep with [[Graph.pageRankFixedPoint]] (scale 1e12, damping
    * 85/100). `CAST(SUM(..) AS BIGINT)` because DuckDB widens BIGINT
    * sums to HUGEINT (int128) while Spark stays LONG.
    */
  private def pageRankSql(iterations: Int): String = {
    val rounds = (1 to iterations).map { i =>
      s"""c$i AS MATERIALIZED (
            SELECT e.dst AS id, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS contrib
            FROM edges e
            JOIN deg d ON d.src = e.src
            JOIN r${i - 1} r ON r.id = e.src
            GROUP BY e.dst),
          r$i AS MATERIALIZED (
            SELECT n.id,
                   (SELECT 150000000000 // n FROM nn)
                     + (85 * COALESCE(c$i.contrib, 0)) // 100 AS rank
            FROM nodes n LEFT JOIN c$i ON c$i.id = n.id)"""
    }.mkString(",\n")
    s"""
      WITH $edgesCte,
      nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
      nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
      deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
      r0 AS MATERIALIZED (SELECT id, (SELECT 1000000000000 // n FROM nn) AS rank FROM nodes),
      $rounds
      SELECT id, rank FROM r$iterations ORDER BY id"""
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // PageRank over the trading graph, 5 power-iteration rounds in
    // fixed-point integer arithmetic (bit-exact vs the unrolled oracle).
    Q(
      "gr1_pagerank",
      (s, d) => Graph.pageRankFixedPoint(tradeEdgesCached(s, d), iterations = 5)
        .orderBy("id"),
      Some(pageRankSql(5))),

    // ----------------------------------------------------------------
    // Degree distribution of the same graph: how many vertices have each
    // out-degree — the audit that catches hub blow-ups (a vertex with
    // degree 1e7 means the per-vertex join fan-out needs a cap) before
    // they melt a shuffle.
    Q(
      "gr2_degree_hist",
      (s, d) => Graph.outDegrees(tradeEdgesCached(s, d))
        .groupBy(col("outdeg").as("degree"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree"),
      Some(s"""
        WITH $edgesCte,
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1)
        SELECT outdeg AS degree, COUNT(*) AS n_nodes
        FROM deg GROUP BY 1 ORDER BY 1""")),

    // ----------------------------------------------------------------
    // Triangle enumeration over the nation-level trade projection:
    // nations A,B are adjacent when any customer of A bought from any
    // supplier of B. The projection (distinct nation pairs out of the
    // 4-table fact join) is the 100 TB-scale step and reduces to a
    // pre-aggregated distinct; enumeration then runs on the tiny
    // projected edge set via two equi-joins, each triangle exactly once
    // (canonical a < b < c orientation).
    Q(
      "gr3_nation_triangles",
      (s, d) => {
        val pe = Tables.customer(s, d)
          .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .filter(col("c_nationkey") =!= col("s_nationkey"))
          .select(
            least(col("c_nationkey"), col("s_nationkey")).as("a"),
            greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
          .distinct()
        val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
        Graph.triangles(pe)
          .join(broadcast(nat.select(col("n_nationkey").as("a"),
            col("n_name").as("n1"))), "a")
          .join(broadcast(nat.select(col("n_nationkey").as("b"),
            col("n_name").as("n2"))), "b")
          .join(broadcast(nat.select(col("n_nationkey").as("c"),
            col("n_name").as("n3"))), "c")
          .select("n1", "n2", "n3")
          .orderBy("n1", "n2", "n3")
      },
      Some("""
        WITH pe AS (
          SELECT DISTINCT LEAST(c.c_nationkey, s.s_nationkey) AS a,
                          GREATEST(c.c_nationkey, s.s_nationkey) AS b
          FROM customer c
          JOIN orders o ON o.o_custkey = c.c_custkey
          JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          WHERE c.c_nationkey <> s.s_nationkey),
        tri AS (
          SELECT e1.a AS a, e1.b AS b, e2.b AS c
          FROM pe e1
          JOIN pe e2 ON e2.a = e1.b
          JOIN pe e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT na.n_name AS n1, nb.n_name AS n2, nc.n_name AS n3
        FROM tri
        JOIN nation na ON na.n_nationkey = tri.a
        JOIN nation nb ON nb.n_nationkey = tri.b
        JOIN nation nc ON nc.n_nationkey = tri.c
        ORDER BY 1, 2, 3""")),

    // ----------------------------------------------------------------
    // Single-source BFS (gr4): minimum hop count from customer c1 to
    // every vertex within 4 hops of the trading graph — the
    // reachability-radius audit (how far does influence propagate from
    // a seed domain?) and the first recursive-traversal query class in
    // the inventory. The oracle replays the identical bounded walk as a
    // DuckDB RECURSIVE CTE (union of all ≤4-hop walks, per-vertex
    // minimum) — exact integer hops, engine-independent.
    Q(
      "gr4_bfs_hops",
      (s, d) => Graph.bfsHops(tradeEdgesCached(s, d), source = "c1", maxHops = 4)
        .orderBy("id"),
      Some(s"""
        WITH RECURSIVE $edgesCte,
        walk(id, hop) AS (
          SELECT 'c1' AS id, 0 AS hop
          UNION
          SELECT e.dst, w.hop + 1
          FROM walk w JOIN edges e ON e.src = w.id
          WHERE w.hop < 4)
        SELECT id, CAST(MIN(hop) AS INTEGER) AS hop
        FROM walk GROUP BY id ORDER BY id""")),

    // ----------------------------------------------------------------
    // Label propagation (gr5): 3 synchronous rounds of
    // most-frequent-neighbor-label community detection with a
    // deterministic smallest-label tie-break — the domain-clustering
    // audit over the trading graph. The oracle unrolls the identical
    // recurrence as chained MATERIALIZED CTEs (count per (vertex,
    // label), argmax via row_number over (count DESC, label)), the same
    // trick as gr1/t24.
    Q(
      "gr5_label_prop",
      (s, d) => Graph.labelPropagation(tradeEdgesCached(s, d), rounds = 3)
        .orderBy("id"),
      Some(labelPropSql(3)))
  )

  /** Unrolled synchronous label-propagation recurrence — in lockstep
    * with [[Graph.labelPropagation]] (most frequent in-neighbor label,
    * ties to the smallest label, no-in-edge vertices keep theirs).
    */
  private def labelPropSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""u$i AS MATERIALIZED (
            SELECT id, label FROM (
              SELECT e.dst AS id, l.label AS label,
                     row_number() OVER (PARTITION BY e.dst
                       ORDER BY COUNT(*) DESC, l.label) AS rn
              FROM edges e JOIN l${i - 1} l ON l.id = e.src
              GROUP BY e.dst, l.label) t
            WHERE rn = 1),
          l$i AS MATERIALIZED (
            SELECT p.id, COALESCE(u$i.label, p.label) AS label
            FROM l${i - 1} p LEFT JOIN u$i ON u$i.id = p.id)"""
    }.mkString(",\n")
    s"""
      WITH $edgesCte,
      nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
      l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes),
      $steps
      SELECT id, label FROM l$rounds ORDER BY id"""
  }
}
