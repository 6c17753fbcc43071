package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iterative graph analytics over relational edge lists — the one
  * standard engine category (Pregel-style fixed-point computation)
  * not covered by the connected-components machinery in [[Dedup]].
  *
  * The demonstration graph is the bipartite supplier↔part co-supply
  * graph: an undirected edge per DISTINCT (l_suppkey, l_partkey) pair
  * in `lineitem`. PageRank over it ranks suppliers by how many
  * widely-supplied parts they carry (and parts by how central their
  * supplier set is) — the "importance over a derived relation" shape
  * a curation pipeline uses to weight sources by citation/link mass.
  *
  * EXACT-ARITHMETIC DESIGN: ranks are carried as fixed-point BIGINT
  * "mass units" (`Unit` = 10¹²) and every update uses INTEGER
  * division — `r div deg`, `(85 * s) div 100` — so each iteration is
  * associative integer addition of identical operands in any engine.
  * A float PageRank is order-dependent (neighbor sums), which would
  * make a cross-engine hash gate flaky by construction; the integer
  * form is bit-reproducible and the DuckDB oracle (an unrolled CTE
  * chain using `//`) matches hash-for-hash. The floor in each
  * division leaks ≤1 unit of mass per node per iteration (≤ n·iters
  * / 10¹² of total mass) — a deterministic, documented bias, not an
  * approximation knob.
  *
  * Scale: each iteration is ONE edge-sized shuffle join (edges ⋈
  * per-node shares on src — the static degree is carried inside the
  * rank relation, so the share `r div deg` is a pure projection and
  * no degree join ever enters the loop) + one partial-agg groupBy on
  * dst + one node-sized left join back to the degree/node universe.
  * The persisted edges side keeps its hash partitioning on src across
  * all iterations; the rank side is node-sized and re-shuffles each
  * round (it is the data that changed). Ranks are persisted per
  * iteration and the previous iteration is eagerly unpersisted — the
  * Pregel discipline that keeps lineage (and recovery cost) O(1) in
  * the iteration count instead of exponential plan growth. No
  * driver-side state beyond the loop counter.
  */
object Graphs {

  /** Total rank mass in fixed-point units (10¹²: large enough that
    * `Unit div n` keeps ≥6 significant digits at n ≤ 10⁶ nodes,
    * small enough that `85 * mass` stays far below 2⁶³). */
  private val Unit = 1000000000000L

  /** Undirected edge list of the supplier↔part graph, both
    * directions materialized (src, dst as tagged string node ids). */
  private[graft] def supplyEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.load(s, dir, "lineitem")
      .select(concat(lit("s"), col("l_suppkey")).as("sn"),
        concat(lit("p"), col("l_partkey")).as("pn"))
      .distinct()
    pairs.select(col("sn").as("src"), col("pn").as("dst"))
      .unionByName(pairs.select(col("pn").as("src"), col("sn").as("dst")))
  }

  /** Damped PageRank (d = 0.85), `iters` synchronous iterations from
    * a uniform start, in fixed-point integer arithmetic. Returns every
    * node with its final rank mass (BIGINT units of 10⁻¹²). There are
    * no dangling nodes by construction — every node comes from an
    * edge, and the graph is undirected — so no leaked-mass
    * redistribution term is needed.
    */
  def pageRank(s: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val edges = supplyEdges(s, dir)
      .repartition(col("src"))
      .persist()
    // the degree relation doubles as the node universe; persisted with
    // a node hash layout so the per-iteration left join reuses it
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
      .repartition(col("node")).persist()
    val n = deg.count()
    if (n == 0) {
      // empty graph: schema-correct empty result, nothing left pinned
      val out = deg.select(col("node"), col("deg").as("rank_fp"))
      edges.unpersist(); deg.unpersist()
      return out
    }
    // uniform start: every node gets (Unit div n) mass; the static
    // degree rides inside the rank relation so the loop never joins it
    var ranks = deg
      .select(col("node"), lit(Unit / n).as("r"), col("deg")).persist()
    val teleport = (15L * Unit) / (100L * n)
    for (_ <- 1 to iters) {
      val prev = ranks
      // per-node share r div deg (a projection — bit-identical to the
      // per-edge division it replaces), summed at dst; a node with no
      // in-mass this round still gets the teleport term
      val share = ranks
        .select(col("node").as("src"), expr("r div deg").as("c"))
      val contrib = edges.join(share, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = deg
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"),
          col("deg"))
        .persist()
      ranks.count() // materialize before dropping the previous iteration
      prev.unpersist()
    }
    // eager node-sized checkpoint so every iteration cache (including
    // the final one) can be dropped before returning
    val out = ranks.select(col("node"), col("r").as("rank_fp"))
      .orderBy(col("rank_fp").desc, col("node").asc)
      .localCheckpoint(true)
    edges.unpersist(); deg.unpersist(); ranks.unpersist()
    out
  }

  /** The unrolled DuckDB restatement of [[pageRank]] — one CTE per
    * iteration, `//` where the Spark side uses `div`. Generated here
    * so the iteration count can never drift between engine and oracle.
    */
  def pageRankOracleSql(iters: Int = 5): String = {
    val base =
      s"""WITH pairs AS (
         |  SELECT DISTINCT 's' || l_suppkey AS sn, 'p' || l_partkey AS pn FROM lineitem
         |), edges AS (
         |  SELECT sn AS src, pn AS dst FROM pairs
         |  UNION ALL
         |  SELECT pn AS src, sn AS dst FROM pairs
         |), deg AS (
         |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
         |), params AS (
         |  SELECT count(*) AS n FROM deg
         |), it0 AS (
         |  SELECT node, ${Unit}::BIGINT // p.n AS r FROM deg, params p
         |)""".stripMargin
    val steps = (1 to iters).map { k =>
      s""", it$k AS (
         |  SELECT d.node,
         |         CAST((15 * ${Unit}::BIGINT) // (100 * p.n)
         |           + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM deg d CROSS JOIN params p
         |  LEFT JOIN (
         |    SELECT e.dst AS node, CAST(SUM(rp.r // dg.deg) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN it${k - 1} rp ON e.src = rp.node
         |    JOIN deg dg ON dg.node = e.src
         |    GROUP BY e.dst
         |  ) c ON c.node = d.node
         |)""".stripMargin
    }.mkString
    base + steps +
      s"\nSELECT node, r AS rank_fp FROM it$iters ORDER BY rank_fp DESC, node ASC"
  }
}
