package graft.queries

import graft.operators.Graph
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Link-graph centrality queries (operators/Graph.scala) over a
  * deterministic synthetic link graph derived from `documents` — the
  * same convention as q_url_canonical's synthesized URLs: both engines
  * derive identical edges from `doc_id`, so the oracle is exact.
  *
  * The graph: every page links to ~4 targets — three integer-division
  * funnels `(doc_id div k + 101k) % n` for k ∈ {2,3,5} (hubby,
  * non-uniform in-degree) plus a hard hub edge `doc_id % 10` (10 hub
  * pages collect ~n/10 in-links each), self-loops dropped, exact
  * duplicate edges collapsed. Every page keeps ≥2 out-edges, so the
  * dangling term is structurally zero and the oracle can omit it
  * (the Spark side still computes it — the path is spec-covered with
  * real dangling nodes in GraphSpec).
  */
object GraphQueries extends QueryPack {

  private val hubMod = 10
  private val funnels = Seq(2 -> 202, 3 -> 303, 5 -> 505)
  private val iterations = 5
  private val damping = 0.85
  private val lpaRounds = 4
  private val walkLen = 6
  private val walkSeed = 7L

  /** Deterministic page link graph; mirrored text in [[edgesSql]]. */
  private def linkEdges(docs: DataFrame, n: Long): DataFrame = {
    val parts = funnels.map { case (k, off) =>
      docs.select(
        col("doc_id").as("src"),
        expr(s"(doc_id div $k + $off) % $n").as("dst"))
    } :+ docs.select(col("doc_id").as("src"), (col("doc_id") % hubMod).as("dst"))
    parts.reduce(_ unionAll _).filter(col("src") =!= col("dst")).distinct()
  }

  private val edgesSql: String = {
    val n = "(SELECT count(*) FROM documents)"
    val funnelSelects = funnels.map { case (k, off) =>
      s"SELECT doc_id AS src, (doc_id // $k + $off) % $n AS dst FROM documents"
    }
    val all = funnelSelects :+ s"SELECT doc_id AS src, doc_id % $hubMod AS dst FROM documents"
    s"""SELECT src, dst FROM (
       |  ${all.mkString("\n  UNION ALL\n  ")}
       |) WHERE src <> dst
       |GROUP BY src, dst""".stripMargin
  }

  /** Unrolled fixed-iteration PageRank CTE chain ending in r$iterations
    * (id, pr). Contribution sums ride DECIMAL(27,18) on both sides —
    * the QueryPack order-independence convention.
    */
  private val pageRankSql: String = {
    val n = "(SELECT count(*) FROM documents)"
    val iterBlocks = (1 to iterations).map { i =>
      s""" c$i AS (SELECT e.dst AS id,
         |          CAST(SUM(CAST(r.pr / o.od AS DECIMAL(27,18))) AS DOUBLE) AS c
         |        FROM edges e JOIN r${i - 1} r ON r.id = e.src
         |                     JOIN outdeg o ON o.src = e.src
         |        GROUP BY e.dst),
         | r$i AS (SELECT d.doc_id AS id,
         |          ${1.0 - damping} / $n + $damping * COALESCE(c.c, 0.0) AS pr
         |        FROM documents d LEFT JOIN c$i c ON c.id = d.doc_id)""".stripMargin
    }
    s"""WITH edges AS ($edgesSql),
       | outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src),
       | r0 AS (SELECT doc_id AS id, 1.0 / $n AS pr FROM documents),
       |${iterBlocks.mkString(",\n")}""".stripMargin
  }

  /** Unrolled TrustRank chain: same contribution blocks, teleport and
    * r0 flow to the seed distribution (hub-adjacent trusted seeds
    * `doc_id % 50 = 0`, weight 50/n each so the reset sums to 1 at
    * every scale).
    */
  private val trustRankSql: String = {
    val n = "(SELECT count(*) FROM documents)"
    val iterBlocks = (1 to iterations).map { i =>
      s""" c$i AS (SELECT e.dst AS id,
         |          CAST(SUM(CAST(r.pr / o.od AS DECIMAL(27,18))) AS DOUBLE) AS c
         |        FROM edges e JOIN r${i - 1} r ON r.id = e.src
         |                     JOIN outdeg o ON o.src = e.src
         |        GROUP BY e.dst),
         | r$i AS (SELECT t.id,
         |          ${1.0 - damping} * t.reset + $damping * COALESCE(c.c, 0.0) AS pr
         |        FROM reset t LEFT JOIN c$i c ON c.id = t.id)""".stripMargin
    }
    s"""WITH edges AS ($edgesSql),
       | outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src),
       | reset AS (SELECT doc_id AS id,
       |            CASE WHEN doc_id % 50 = 0 THEN 50.0 / $n ELSE 0.0 END AS reset
       |          FROM documents),
       | r0 AS (SELECT id, reset AS pr FROM reset),
       |${iterBlocks.mkString(",\n")}""".stripMargin
  }

  /** Unrolled synchronous-LPA chain ending in l$lpaRounds (id, label).
    * The per-round argmax window orders by (count DESC, label ASC) —
    * label is unique within a (node) partition after the GROUP BY, so
    * the tie-break is total (the QueryPack window rule).
    */
  private val lpaSql: String = {
    val roundBlocks = (1 to lpaRounds).map { i =>
      s""" b$i AS (SELECT s.dst AS id, l.label AS label
         |        FROM sym s JOIN l${i - 1} l ON l.id = s.src
         |        GROUP BY s.dst, l.label
         |        QUALIFY row_number() OVER (
         |          PARTITION BY s.dst
         |          ORDER BY count(*) DESC, l.label ASC) = 1),
         | l$i AS (SELECT l.id, COALESCE(b.label, l.label) AS label
         |        FROM l${i - 1} l LEFT JOIN b$i b ON b.id = l.id)""".stripMargin
    }
    s"""WITH edges AS ($edgesSql),
       | sym AS (SELECT src, dst FROM edges
       |         UNION SELECT dst AS src, src AS dst FROM edges),
       | l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
       |${roundBlocks.mkString(",\n")}""".stripMargin
  }

  /** Unrolled walk chain ending in w$walkLen (start, cur, walk): hop t
    * indexes the sorted neighbor list at
    * `(cur*1103515245 + t*12345 + seed) mod outdeg` — bit-identical
    * 64-bit arithmetic in both engines (Walks.lcgMix).
    */
  private val walksSql: String = {
    def hop(t: Int) =
      s"a.nbrs[CAST((w.cur*1103515245 + $t*12345 + $walkSeed) % a.deg AS INT) + 1]"
    val hopBlocks = (1 to walkLen).map { t =>
      s""" w$t AS (SELECT w.start,
         |          CASE WHEN a.src IS NULL THEN NULL ELSE ${hop(t)} END AS cur,
         |          CASE WHEN a.src IS NULL THEN w.walk
         |               ELSE list_append(w.walk, ${hop(t)}) END AS walk
         |        FROM w${t - 1} w LEFT JOIN adj a ON a.src = w.cur)""".stripMargin
    }
    s"""WITH edges AS ($edgesSql),
       | adj AS (SELECT src, list(dst ORDER BY dst) AS nbrs, count(*) AS deg
       |         FROM edges GROUP BY src),
       | w0 AS (SELECT doc_id AS start, doc_id AS cur, [doc_id] AS walk
       |        FROM documents),
       |${hopBlocks.mkString(",\n")}""".stripMargin
  }

  private def pages(s: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    val docs = Tables.load(s, dir, "documents")
    val n = docs.count()
    (docs, linkEdges(docs, n), n)
  }

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // page-level PageRank, 5 iterations, damping 0.85 — the centrality
    // prior a curation pipeline scores documents with.
    // Rank outputs are ROUND(pr, 7) on BOTH sides: the engines' double→
    // decimal cast semantics disagree by ~1e-18 per contribution term
    // (Spark quantizes the shortest decimal repr HALF_UP; DuckDB scales
    // in binary), accumulating to ~1e-16 over the iteration chain — and
    // Spark's decimal-quantized ranks land EXACTLY on the comparator's
    // 9-dp half boundaries, so at 50k+ rows an unrounded gate straddles
    // one (~1e-16 noise vs 1e-9 grid; measured: 974/50k rows with raw
    // diffs ≤ 6.8e-17 at sf1, doc 763 = 0.0001596725 exactly). At 1e-7
    // grid the straddle probability is ~1e-10/row — deterministic in
    // practice at every gate scale, still ≥5 significant digits at
    // sf0.01.
    "q_graph_pagerank" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .pageRank(docs.select(col("doc_id").as("id")), edges, iterations, damping)
        .select(col("id").as("doc_id"), round(col("pr"), 7).as("pr"))
        .orderBy("doc_id")
    },
    // host-level rank: page ranks folded to their host (source) — the
    // join-back that turns link centrality into a per-host quality prior
    "q_graph_host_rank" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      val pr = Graph.pageRank(docs.select(col("doc_id").as("id")), edges, iterations, damping)
      Graph
        .hostRank(pr, docs.select(col("doc_id").as("id"), col("source").as("host")))
        .orderBy("host")
    },
    // TrustRank: teleport + dangling mass flow to a trusted seed set —
    // the spam-demotion prior; seeds doc_id % 50 = 0 at weight 50/n
    "q_graph_trustrank" -> { (s, dir) =>
      val (docs, edges, n) = pages(s, dir)
      val reset = docs.select(
        col("doc_id").as("id"),
        when(col("doc_id") % 50 === 0, lit(50.0 / n)).otherwise(lit(0.0)).as("reset"))
      Graph
        .pageRank(
          docs.select(col("doc_id").as("id")), edges, iterations, damping,
          reset = Some(reset))
        .select(col("id").as("doc_id"), round(col("pr"), 7).as("pr"))
        .orderBy("doc_id")
    },
    // exact in/out degree per page, zero-degree pages kept
    "q_graph_degrees" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .degrees(docs.select(col("doc_id").as("id")), edges)
        .join(docs.select(col("doc_id"), col("source")), col("id") === col("doc_id"))
        .select(col("doc_id"), col("source"), col("out_deg"), col("in_deg"))
        .orderBy("doc_id")
    },
    // synchronous label-propagation communities (undirected, 4 rounds,
    // smallest-label ties) — the host/near-dup grouping primitive
    "q_graph_communities" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .labelPropagation(docs.select(col("doc_id").as("id")), edges, lpaRounds)
        .select(col("id").as("doc_id"), col("community"))
        .orderBy("doc_id")
    },
    // deterministic DeepWalk corpus: 6 hops from every page, LCG hop
    // selector (the oracle-mirrored mix; production uses Walks.hashMix).
    // The walk serializes via array_join — every gated output column must
    // be scalar for the driver's comparator (the q_collect convention,
    // RelationalQueries.scala:251-252).
    "q_graph_walks" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .randomWalks(
          edges,
          docs.select(col("doc_id").as("id")),
          walkLen,
          graft.operators.Walks.lcgMix(walkSeed))
        .select(col("start").as("doc_id"), array_join(col("walk"), ",").as("walk"))
        .orderBy("doc_id")
    }
  )

  /** HyperBall harmonic centrality: DataSketches-HLL ball growth has no
    * DuckDB mirror, so the row is bench-only; value behavior is pinned
    * against exact BFS harmonic centrality in GraphSpec.
    */
  override def benchDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_harmonic" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .harmonicCentrality(docs.select(col("doc_id").as("id")), edges, maxRadius = 8)
        .select(col("id").as("doc_id"), col("ball"), col("harmonic"))
        .orderBy("doc_id")
    },
    // neighbourhood function N(r) + effective diameter from the same
    // HyperBall loop: O(diameter) rows out, one 1-row probe per radius.
    // Bench-only (HLL estimates, no DuckDB mirror); exact-mode pins vs
    // all-pairs BFS live in GraphSpec
    "q_graph_neighborhood" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .neighborhoodFunction(
          docs.select(col("doc_id").as("id")), edges, maxRadius = 8)
        .orderBy("radius")
    },
    // production walk corpus: same operator body as the gated
    // q_graph_walks but the xxhash64 hop mix (uniform at any id range;
    // no 64-bit-arithmetic DuckDB mirror) — benches the path users run
    "q_graph_walks_hash" -> { (s, dir) =>
      val (docs, edges, _) = pages(s, dir)
      Graph
        .randomWalks(
          edges,
          docs.select(col("doc_id").as("id")),
          walkLen,
          graft.operators.Walks.hashMix(walkSeed))
        .select(col("start").as("doc_id"), col("walk"))
        .orderBy("doc_id")
    }
  )

  override def oracles: Map[String, String] = Map(
    "q_graph_pagerank" ->
      s"""$pageRankSql
         |SELECT id AS doc_id, ROUND(pr, 7) AS pr
         |FROM r$iterations ORDER BY doc_id""".stripMargin,
    "q_graph_host_rank" ->
      s"""$pageRankSql
         |SELECT d.source AS host,
         |       CAST(SUM(CAST(r.pr AS DECIMAL(27,18))) AS DOUBLE) AS host_rank,
         |       COUNT(*) AS n_pages
         |FROM r$iterations r JOIN documents d ON d.doc_id = r.id
         |GROUP BY d.source
         |ORDER BY host""".stripMargin,
    "q_graph_trustrank" ->
      s"""$trustRankSql
         |SELECT id AS doc_id, ROUND(pr, 7) AS pr
         |FROM r$iterations ORDER BY doc_id""".stripMargin,
    "q_graph_communities" ->
      s"""$lpaSql
         |SELECT id AS doc_id, label AS community FROM l$lpaRounds ORDER BY doc_id""".stripMargin,
    "q_graph_walks" ->
      s"""$walksSql
         |SELECT start AS doc_id, ARRAY_TO_STRING(walk, ',') AS walk
         |FROM w$walkLen ORDER BY doc_id""".stripMargin,
    "q_graph_degrees" ->
      s"""WITH edges AS ($edgesSql),
         | od AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
         | idg AS (SELECT dst, count(*) AS in_deg FROM edges GROUP BY dst)
         |SELECT d.doc_id, d.source,
         |       COALESCE(o.out_deg, 0) AS out_deg,
         |       COALESCE(i.in_deg, 0) AS in_deg
         |FROM documents d
         |LEFT JOIN od o ON o.src = d.doc_id
         |LEFT JOIN idg i ON i.dst = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
  )
}
