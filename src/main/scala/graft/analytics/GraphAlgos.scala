package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph analytics over edge lists — degree structure and
  * centrality. The reference engine has no analytics layer (its Volcano
  * iterators answer point queries, /root/reference/graph/iterator/and.go
  * and siblings);
  * at warehouse scale a knowledge graph also needs the corpus-wide passes
  * a traversal engine cannot express, and those are native Spark
  * aggregation/join plans.
  */
object GraphAlgos {

  /** Degree histogram: for every degree k, the number of nodes with
    * exactly k incident edges on `nodeCol`'s side. Two hash aggregates
    * (node → degree, then degree → node count), both map-side combined
    * and the second one tiny — the canonical two-pass distributive
    * aggregation. No sort, no window, survives any scale the first
    * groupBy's shuffle survives.
    */
  def degreeHistogram(edges: DataFrame, nodeCol: String): DataFrame =
    edges.groupBy(col(nodeCol)).agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))

  /** PageRank over an edge list, fixed iteration count.
    *
    * Semantics (differential-tested against the sequential
    * [[pageRankLocal]] evaluation of the same recurrence):
    * {{{
    *   r_0(v) = 1/N
    *   r_k(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} r_{k-1}(u) / outdeg(u)
    * }}}
    * Dangling-node mass is NOT redistributed (it decays into the teleport
    * term): redistribution needs a driver action per iteration to read the
    * dangling sum, while this variant keeps every iteration pure DataFrame
    * algebra — one shuffle join on `src` + one shuffle aggregate on `dst`,
    * so Catalyst sees a single lazy plan per checkpoint epoch.
    *
    * Scale shape: `edges ⋈ outdeg` is computed once and checkpointed
    * (at a real deployment: persisted, hash-partitioned on src — every
    * iteration's join then reuses that partitioning). Ranks are
    * |V|-sized, always the small side of nothing — both join inputs are
    * node-hash-partitioned, no broadcast assumption. Lineage is cut with
    * localCheckpoint every `checkpointEvery` iterations so the plan stays
    * O(checkpointEvery) deep regardless of iteration count.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85,
               checkpointEvery: Int = 4): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, damping,
      checkpointEvery, sources = None)

  /** Personalized PageRank (random walk with restart): identical
    * recurrence, but the teleport mass lands only on `sources` instead of
    * uniformly — ranks then measure proximity to the source set (the
    * standard seed-expansion / related-entities primitive). `sources` is
    * a one-column DataFrame of node ids; restart mass splits evenly
    * across the sources present in the graph. Same per-iteration plan as
    * [[pageRank]] plus one broadcast-size semi-join-shaped left join to
    * mark source nodes (done once, outside the loop).
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           sources: DataFrame, iterations: Int = 10,
                           damping: Double = 0.85,
                           checkpointEvery: Int = 4): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iterations, damping,
      checkpointEvery, sources = Some(sources))

  private def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
                           iterations: Int, damping: Double,
                           checkpointEvery: Int,
                           sources: Option[DataFrame]): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // restart-mass column: uniform 1/N, or 1/|S| on source nodes only
    val seeded = sources match {
      case None =>
        val n = nodes.count()
        require(n > 0, "pageRank: empty edge list")
        nodes.withColumn("restart", lit(1.0 / n))
      case Some(src) =>
        val s = src.toDF("node").distinct()
        val marked = nodes.join(s.withColumn("__is_src", lit(true)),
          Seq("node"), "left").localCheckpoint(true)
        val nSrc = marked.where(col("__is_src")).count()
        require(nSrc > 0, "personalizedPageRank: no source present in graph")
        marked.select(col("node"),
          when(col("__is_src"), lit(1.0 / nSrc)).otherwise(lit(0.0))
            .as("restart"))
    }
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val eDeg = e.join(outDeg, "src").localCheckpoint(true)
    var ranks = seeded.withColumn("rank", col("restart"))
    for (i <- 1 to iterations) {
      val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("odeg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      ranks = seeded.join(contribs, Seq("node"), "left")
        .select(col("node"), col("restart"),
          (lit(1.0 - damping) * col("restart") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Sequential reference evaluation of [[pageRank]]'s exact recurrence on
    * a collected edge list — the differential oracle for the distributed
    * path. Float inflow sums accumulate here in sorted-source order vs
    * partition order there, so agreement is asserted within a tolerance
    * (non-associativity of double addition), never bitwise.
    */
  def pageRankLocal(edges: Seq[(Long, Long)], iterations: Int = 10,
                    damping: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val odeg = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    val in = edges.groupBy(_._2).map { case (k, v) =>
      k -> v.map(_._1).sorted
    }
    val teleport = (1.0 - damping) / n
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      r = nodes.map { v =>
        val inflow = in.getOrElse(v, Nil).map(u => r(u) / odeg(u)).sum
        v -> (teleport + damping * inflow)
      }.toMap
    }
    r
  }

  /** Exact triangle count via degree-ordered edge orientation — the
    * scalable formulation: canonicalize to distinct undirected edges,
    * orient every edge from its (degree, id)-smaller endpoint to the
    * larger, enumerate wedges at each pivot's out-edges, and close them
    * against the canonical edge set. Orientation bounds every node's
    * out-degree by O(√E) on ANY graph (each triangle has exactly one
    * pivot, so it is counted once) — the wedge self-join's fan-out is
    * capped where the naive neighbor join explodes on hubs. All joins
    * hash-partition on node/edge keys; the result is computed as one
    * lazy plan (two tiny aggregates cross-joined), no driver action.
    *
    * Returns one row `(n_edges, n_triangles)`.
    */
  def triangleCount(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    // und feeds FOUR consumers (degree agg, orientation join, wedge
    // close, edge count) and oriented feeds both sides of the wedge
    // self-join — Catalyst recomputes identical subplans per consumer
    // (same finding as the dedup self-join sides), so materialize each
    // once; both are O(E) narrow tables
    val und = edges
      .select(col(srcCol).as("x"), col(dstCol).as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("dg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint(true)
    val e1 = oriented.as("e1"); val e2 = oriented.as("e2")
    // e1.v < e2.v both dedups the unordered wedge pair and hands the
    // closing edge already in canonical (a < b) order
    val wedges = e1.join(e2,
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("a"), col("e2.v").as("b"))
    val closed = wedges.join(und, Seq("a", "b"))
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  /** Weakly connected components over an edge list: delegates to the
    * two-tier CC engine built for duplicate clustering (Dedup.scala —
    * one bounded collect + driver union-find under the 5 M-edge gate,
    * where a single Spark round costs more than a million-edge
    * union-find; distributed min-label with pointer-doubling shortcut
    * above it, O(log diameter) rounds). Returns (node, component) with
    * the component labeled by its minimum node id.
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val pairs = edges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b"))
    val ids = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct()
    Dedup.connectedComponents(pairs, ids)
      .select(col("id").as("node"), col("cluster").as("component"))
  }

  /** Component-size histogram: for each component size, how many
    * components have it — the shape summary of a graph's connectivity
    * (two tiny aggregates on top of [[connectedComponents]]).
    */
  def componentSizeHistogram(edges: DataFrame, srcCol: String,
                             dstCol: String): DataFrame =
    connectedComponents(edges, srcCol, dstCol)
      .groupBy("component").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("n_components"))

  /** Contract harness for the driver oracle: run the distributed PageRank
    * and the sequential reference on the same (small) edge list and
    * return one row `(pagerank_ok, n_nodes)` — true iff every node's rank
    * agrees within `tol` AND both sides agree on the top-ranked node.
    * The collect is the ORACLE side only (scoped like LocalEval's
    * differential tests); the operator under test never collects.
    */
  def pageRankContract(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int = 10, tol: Double = 1e-9): DataFrame = {
    val spark = edges.sparkSession
    val dist = pageRank(edges, srcCol, dstCol, iterations)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val es = edges.select(col(srcCol), col(dstCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val local = pageRankLocal(es, iterations)
    val sameNodes = dist.keySet == local.keySet
    val close = sameNodes && local.forall { case (v, lr) =>
      math.abs(dist(v) - lr) < tol
    }
    val topAgree = sameNodes && dist.nonEmpty &&
      dist.maxBy { case (v, r) => (r, v) }._1 ==
        local.maxBy { case (v, r) => (r, v) }._1
    spark.range(1).select(lit(close && topAgree).as("pagerank_ok"),
      lit(local.size.toLong).as("n_nodes"))
  }
}
