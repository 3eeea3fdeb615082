package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's storage layout: two DataFrames mirroring the reference's
  * two global collections (all-nodes / all-quads,
  * /root/reference/graph/quadstore.go:102-106), dictionary-encoded like its
  * kv backend (/root/reference/graph/proto/primitive.proto:21-29) but with
  * content-hash ids (the sql/nosql backends' `refs.ValueHash`,
  * /root/reference/graph/refs/refs.go:55-70) so that value→id resolution is
  * pure computation.
  *
  *  - `nodes(id, kind, s, i, d, b, t, lang, dt, sk)`: the dictionary; `sk`
  *    is the precomputed sort key (`quad.Value.String()` form).
  *  - `quads(s, p, o, l)`: four long ids; `l` null for unlabeled quads.
  *
  * Scale notes (100 TB target): every traversal is an equi-join / literal
  * filter on longs; the quads table should be written partitioned by a
  * predicate bucket (`pb = pmod(p, N)`) so predicate-constrained scans prune
  * files (the kv backend's SP/OPS composite indexes,
  * /root/reference/graph/kv/indexing.go:62-71, become partition pruning +
  * Parquet min/max on s/o). The nodes dictionary is ~|distinct values| and
  * joins broadcast per-predicate slices.
  */
final case class Graph(nodes: DataFrame, quads: DataFrame,
                       predicateBuckets: Int = 0,
                       predStats: Option[Map[Long, Long]] = None,
                       interactiveMaxQuads: Long = 0L,
                       quadsOps: Option[DataFrame] = None) {
  def spark: SparkSession = nodes.sparkSession

  def cached(): Graph = copy(nodes = nodes.cache(), quads = quads.cache(),
    quadsOps = quadsOps.map(_.cache()))

  /** Opt into the driver-local point-lookup fast path
    * (graft.shape.LocalEval): queries on this graph evaluate against an
    * in-memory index — the reference memstore's role — when the quad count
    * is under `maxQuads`, and fall back to the distributed path otherwise.
    * The cap keeps this an interactive-store feature: at warehouse scale
    * the gate never opens. Mutations produce new DataFrames, so a mutated
    * graph re-derives (or re-rejects) its index automatically.
    */
  def interactive(maxQuads: Long = graft.shape.LocalEval.DefaultMaxQuads): Graph =
    copy(interactiveMaxQuads = maxQuads)

  /** (node count, quad count). Every quad has a predicate, so when the
    * per-predicate stats are materialized their sum IS the quad count —
    * one fewer pass over the quads table.
    */
  def stats: (Long, Long) =
    (nodes.count(), predStats.map(_.values.sum).getOrElse(quads.count()))

  /** Materialize per-predicate quad counts (the reference's QuadIndexer
    * stats, shape.go:694-726): one small aggregate (predicates are
    * low-cardinality), letting the planner fold a zero-count predicate
    * constraint to the empty relation without scanning. At store scale
    * these numbers come from Parquet footers / a stats table written at
    * load time; here one job on the (usually cached) quads table.
    */
  def withStats(): Graph = copy(predStats = Some(
    quads.groupBy("p").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap))

  /** Persist as Parquet. `predicateBuckets > 0` writes quads partitioned by
    * `pb = pmod(p, buckets)` — the scale path: a query constraining `p`
    * reads only the matching partition directories (the lowering adds the
    * `pb` filter whenever it has a literal predicate set, so pruning is
    * static, not even dynamic).
    */
  /** `objectIndex = true` writes the reference's dual-index layout
    * (`DefaultQuadIndexes = [SP, OPS]`, graph/kv/indexing.go:62-71) as
    * two Parquet orderings: the primary sorted by (p, s) within each
    * predicate bucket — forward hops with literal subjects skip row
    * groups on s min/max — and a `quads_ops` sibling with the SAME rows
    * sorted by (p, o), so reverse hops with literal objects prune the
    * way forward ones do. The sibling is built by re-reading the files
    * just written (the input plan evaluates once); readers pick it up
    * through `graft_meta.json` and the lowering scans whichever
    * ordering matches the hop's literal side.
    */
  def write(dir: String, predicateBuckets: Int = 0,
            objectIndex: Boolean = false): Unit = {
    nodes.write.mode("overwrite").parquet(s"$dir/nodes")
    // sorted layouts use RANGE partitioning over the full sort key, not
    // repartition(pb): predicates are power-law skewed, so hashing by
    // bucket alone collapses the sort into <= buckets tasks with one
    // giant one (measured 127.8 s for the 47 M-quad dual-index write;
    // range-partitioned: every task an equal slice, files still
    // internally sorted so row-group min/max stats stay tight — a file
    // containing one predicate's id range prunes identically whether
    // its sibling file holds the same predicate or the next one).
    // Range sampling re-evaluates a slice of the input plan: hand
    // objectIndex writes a cached/checkpointed graph when the quads
    // lineage is an expensive pipeline.
    val sortParts = math.max(
      nodes.sparkSession.sessionState.conf.numShufflePartitions,
      predicateBuckets)
    if (predicateBuckets > 0) {
      val q = quads.withColumn("pb", pmod(col("p"), lit(predicateBuckets)))
      val primary = if (objectIndex)
        q.repartitionByRange(sortParts, col("pb"), col("p"), col("s"))
          .sortWithinPartitions("pb", "p", "s")
      else q
      primary.write.mode("overwrite").partitionBy("pb").parquet(s"$dir/quads")
    } else {
      val primary = if (objectIndex) quads.sort("p", "s") else quads
      primary.write.mode("overwrite").parquet(s"$dir/quads")
    }
    if (objectIndex) {
      val q = nodes.sparkSession.read.parquet(s"$dir/quads")
      if (predicateBuckets > 0)
        q.repartitionByRange(sortParts, col("pb"), col("p"), col("o"))
          .sortWithinPartitions("pb", "p", "o")
          .write.mode("overwrite").partitionBy("pb")
          .parquet(s"$dir/quads_ops")
      else q.sort("p", "o").write.mode("overwrite")
        .parquet(s"$dir/quads_ops")
    } else {
      // a prior objectIndex=true write may have left a sibling: readers
      // are meta-gated so it's dead weight, but it silently doubles the
      // store footprint — remove it
      val stale = new java.io.File(s"$dir/quads_ops")
      if (stale.exists())
        org.apache.commons.io.FileUtils.deleteQuietly(stale)
    }
    // persist per-predicate counts with the store (the QuadIndexer stats
    // table): readers get plan-time size folding without running a job.
    // Count from the files just written, not the input plan — when the
    // quads DataFrame is an expensive uncached pipeline (bulk load), a
    // second full evaluation would double the load cost.
    val st = predStats.getOrElse(
      nodes.sparkSession.read.parquet(s"$dir/quads")
        .groupBy("p").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val statsJson = st.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/graft_meta.json"),
      s"""{"predicateBuckets":$predicateBuckets,""" +
        s""""opsIndex":$objectIndex,"predStats":$statsJson}""")
  }

  /** Delta application (the reference's `ApplyDeltas`,
    * /root/reference/graph/quadwriter.go:49-56): batch add = union+dedup,
    * delete = anti-join. Snapshot semantics — returns the new Graph.
    */
  def addQuads(g2: Graph): Graph = {
    // A graph read from a bucketed store carries the `pb` partition column;
    // an in-memory delta does not. Normalize to the bare columns, then
    // re-derive pb so static partition pruning survives the mutation.
    val base = Seq("s", "p", "o", "l")
    val merged = quads.select(base.map(col): _*)
      .unionByName(g2.quads.select(base.map(col): _*))
      .dropDuplicates(base)
    val q = if (predicateBuckets > 0)
      merged.withColumn("pb", pmod(col("p"), lit(predicateBuckets)))
    else merged
    val n = nodes.unionByName(g2.nodes.select(nodes.columns.toIndexedSeq.map(col): _*))
      .dropDuplicates("id")
    // stats and the object-sorted sibling are both pre-mutation views
    copy(nodes = n, quads = q, predStats = None, quadsOps = None)
  }

  def deleteQuads(g2: Graph): Graph =
    copy(predStats = None, quadsOps = None, quads = quads.join(g2.quads,
      quads("s") === g2.quads("s") && quads("p") === g2.quads("p") &&
        quads("o") === g2.quads("o") && quads("l") <=> g2.quads("l"),
      "left_anti"))
}

object Graph {
  import NQuads.ParsedQuad

  /** Spark-encodable quad of flat value rows; `lbl` null when unlabeled. */
  final case class QuadRow(sub: QV, pred: QV, obj: QV, lbl: QV)

  object QuadRow {
    def apply(q: ParsedQuad): QuadRow =
      QuadRow(QV(q.s), QV(q.p), QV(q.o), q.l.map(QV(_)).orNull)
  }

  private def idOf(c: String): org.apache.spark.sql.Column =
    Values.idCol(col(c))

  /** Build the two tables from a DataFrame with struct columns
    * (sub, pred, obj, lbl). One shuffle total (nodes dedup); quads need
    * none. The dictionary is built by exploding the four positions in a
    * single pass over the input — not four unioned re-reads.
    */
  def fromQuadDF(raw0: DataFrame): Graph = {
    val raw = raw0
    val quads = raw.select(
      idOf("sub").as("s"), idOf("pred").as("p"), idOf("obj").as("o"),
      when(col("lbl").isNull, lit(null).cast(LongType))
        .otherwise(idOf("lbl")).as("l"))
    // dedup BEFORE computing the sort key: `sk` is a wide string-format
    // CASE expression, so evaluate it once per distinct node (|dictionary|
    // rows), not once per value occurrence (4×|quads| rows) — and keep the
    // pre-shuffle rows narrow. Dedup on the VALUE FIELDS, not the id: the
    // id is a pure function of the value, and a keys-only group-by plans
    // as a HashAggregate, where dropDuplicates("id") would need first()
    // carry-along buffers and degrade to a double SortAggregate.
    val nodes = raw
      .select(explode(array(col("sub"), col("pred"), col("obj"), col("lbl")))
        .as("v"))
      .where(col("v").isNotNull)
      .select(col("v.*"))
      .dropDuplicates()
      .select((Values.idColOfFields(col).as("id") +:
        Values.fieldNames.map(col)) :+ Values.sortKeyCol(col).as("sk"): _*)
    Graph(nodes, quads)
  }

  def fromQuads(spark: SparkSession, qs: Seq[ParsedQuad]): Graph = {
    import spark.implicits._
    fromQuadDF(spark.createDataset(qs.map(QuadRow(_))).toDF())
  }

  /** N-Quads reader: distributed line parse (gz/bz2 auto-decompressed by
    * the text source, like the reference's decompressor,
    * /root/reference/internal/decompressor).
    */
  def fromNQuads(spark: SparkSession, path: String): Graph = {
    import spark.implicits._
    // gzip input is non-splittable: without an explicit repartition the
    // whole parse AND the cached quads land on ONE partition, serializing
    // every later scan. Repartition proportionally to input size (~32 MB
    // of compressed text per partition, min 8) — a fixed large count
    // measured SLOWER here: task overhead dominates small cached graphs.
    // LARGE uncompressed text is SPLITTABLE: the file source already
    // yields maxPartitionBytes-sized splits, so a repartition would only
    // add a full shuffle of the raw text before parsing — skip it. Small
    // uncompressed inputs still repartition: file packing can collapse
    // them to a couple of partitions, serializing the parse AND the
    // cached quads exactly like the gz case.
    val lines = spark.read.textFile(path)
    val compressed = lines.inputFiles.exists(f =>
      f.endsWith(".gz") || f.endsWith(".bz2"))
    val totalBytes = lines.inputFiles.map { f =>
      try new java.io.File(new java.net.URI(f)).length() catch {
        case _: Exception => 0L }
    }.sum
    val nPart = math.max(8, (totalBytes / (32L << 20)).toInt)
    val naturallySplit = !compressed && totalBytes >= (64L << 20)
    val rows = (if (naturallySplit) lines else lines.repartition(nPart))
      .flatMap(l => NQuads.parseLine(l).map(QuadRow(_)))
    fromQuadDF(rows.toDF())
  }

  /** Incremental store ingest: merge a delta graph into an on-disk store
    * WITHOUT rewriting existing data — the quad-store analog of
    * `Similarity.ivfAppendQuantized`. At 100 TB a full
    * rebuild per ingest batch is a non-starter; this appends new parquet
    * files and leaves every existing file untouched.
    *
    * Cost shape: the delta is deduplicated internally, then existence-
    * checked only where it can possibly collide — the dictionary gate
    * keeps just the delta quads whose every term id already exists in
    * the stored node dictionary (typical ingest is new-entity-dominated,
    * so this is a sliver, often empty — then the store is never scanned
    * at all). The gated sliver probes the store map-side: the quads
    * table's touched `pb` partitions are scanned ONCE against a
    * broadcast hash of the sliver (LEFT SEMI, build right), so no
    * stored row is ever shuffled — a plain delta-anti-join-store plan
    * would sort-merge the whole touched region and cost as much as a
    * rewrite. Deltas above broadcast size fall back to the shuffle plan.
    * Appended files land only in touched partitions; `graft_meta.json`
    * predStats update incrementally from the appended rows — no
    * store-wide recount. Readers pick up the new files on their next
    * `Graph.read`.
    *
    * Equivalence contract (StoreSpec + the g_store_append driver entry):
    * write(half1) + append(half2) produces the same node set, quad set,
    * and predStats as write(half1 ∪ half2).
    */
  def append(spark: SparkSession, dir: String, delta: Graph): Unit = {
    val appendDebug = sys.env.contains("GRAFT_APPEND_DEBUG")
    var tPhase = System.nanoTime()
    def phase(name: String): Unit = if (appendDebug) {
      val now = System.nanoTime()
      System.err.println(f"append phase=$name secs=${(now - tPhase) / 1e9}%.2f")
      tPhase = now
    }
    val metaPath = java.nio.file.Paths.get(s"$dir/graft_meta.json")
    val stored = read(spark, dir)
    val buckets = stored.predicateBuckets
    val base = Seq("s", "p", "o", "l")
    val dq0 = delta.quads.select(base.map(col): _*).dropDuplicates(base)
    val dq = (if (buckets > 0)
      dq0.withColumn("pb", pmod(col("p"), lit(buckets)))
    else dq0).persist()
    val deltaRows = dq.count() // materialize once; gates the join layout
    phase("dq")
    // node dictionary FIRST: the delta ids already present in the store
    // (dupIds) feed BOTH the fresh-node anti-join and the quad-existence
    // dictionary gate below — one stored-nodes scan serves both
    val dn = delta.nodes.dropDuplicates("id").persist()
    val dnRows = dn.count()
    val smallDelta = deltaRows <= 4000000L && dnRows <= 4000000L
    val dupIds = (if (smallDelta) {
      val dnIds = dn.select("id")
      stored.nodes.select("id")
        .join(broadcast(dnIds), stored.nodes("id") === dnIds("id"),
          "left_semi")
        .select(col("id").as("eid"))
    } else dn.select(col("id").as("eid"))).persist()
    if (smallDelta) dupIds.count()
    phase("dupIds")
    val existing =
      if (buckets > 0) {
        val touched = dq.select("pb").distinct().collect().map(_.getLong(0))
        stored.quads.where(col("pb").isin(touched.toIndexedSeq: _*))
      } else stored.quads
    // Existence check. A plain `dq LEFT ANTI existing` can only broadcast
    // its RIGHT side — the store — so Spark sort-merge-shuffles every
    // touched-partition row, and appending one small batch costs as much
    // as rewriting the store (the r11 driver record measured append ≥
    // write at 47 M quads). For ingest-sized deltas, two cuts:
    //  1. DICTIONARY GATE — a delta quad can only already exist if EVERY
    //     term id is already in the stored dictionary (the library's
    //     Graph invariant: nodes always cover every quad position, both
    //     in stores and in fromQuadDF/fromNQuads-built deltas). Real
    //     ingest batches are dominated by new entities, so the gated
    //     subset is tiny — and when it is EMPTY the store is never
    //     scanned at all.
    //  2. BROADCAST FLIP — for the gated subset, scan the store ONCE
    //     map-side against a broadcast hash (LEFT SEMI, build right) and
    //     anti-join the delta against the (≤ gated-sized) match set.
    //     Zero shuffles of stored data.
    // Oversized deltas (above broadcast comfort) keep the shuffle plan.
    var gatedHandle: Option[DataFrame] = None
    val freshPlan = if (smallDelta) {
      def dictSemi(df: DataFrame, c: String): DataFrame =
        df.join(broadcast(dupIds.select(col("eid").as(c))), Seq(c),
          "left_semi")
      val gatedBase = dictSemi(dictSemi(dictSemi(dq, "s"), "p"), "o")
      val gated = gatedBase.where(col("l").isNull)
        .unionByName(dictSemi(gatedBase.where(col("l").isNotNull), "l"))
        .persist()
      gatedHandle = Some(gated)
      val gc = gated.count()
      phase("gate")
      if (gc == 0L) dq
      else {
        // aliased output: dups' subtree contains dq (the broadcast
        // side), so unaliased s/p/o/l would be ambiguous below
        val dups = existing
          .join(broadcast(gated),
            existing("s") === gated("s") && existing("p") === gated("p") &&
              existing("o") === gated("o") && existing("l") <=> gated("l"),
            "left_semi")
          .select(col("s").as("es"), col("p").as("ep"),
            col("o").as("eo"), col("l").as("el"))
        dq.join(broadcast(dups),
          dq("s") === dups("es") && dq("p") === dups("ep") &&
            dq("o") === dups("eo") && dq("l") <=> dups("el"),
          "left_anti")
      }
    } else dq.join(existing,
      dq("s") === existing("s") && dq("p") === existing("p") &&
        dq("o") === existing("o") && dq("l") <=> existing("l"),
      "left_anti")
    val fresh = if (freshPlan eq dq) dq else freshPlan.persist()
    PlanDump.dump("append_fresh", fresh)
    try {
      // count the appended rows BEFORE writing: the write into dir/quads
      // invalidates every cached plan that reads that path (CacheManager
      // recache-by-path), and a post-write re-evaluation of the anti-join
      // would see the just-appended files and count zero
      val appended = fresh.groupBy("p").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      phase("stats")
      // dual-index store: the same fresh rows land in the object-sorted
      // sibling too (sorted within the appended files — the new files'
      // row-group stats prune like the originals'). MUST run before the
      // primary write: fresh's anti-join reads dir/quads, and writing
      // into that path recaches the plan against the new files — the
      // re-evaluated anti-join would then see its own output and yield
      // zero rows (the same trap the pre-write stats count dodges above)
      if (stored.quadsOps.isDefined) {
        if (buckets > 0)
          fresh.repartitionByRange(col("pb"), col("p"), col("o"))
            .sortWithinPartitions("pb", "p", "o")
            .write.mode("append").partitionBy("pb")
            .parquet(s"$dir/quads_ops")
        else fresh.sort("p", "o").write.mode("append")
          .parquet(s"$dir/quads_ops")
      }
      phase("ops_write")
      if (buckets > 0)
        fresh.write.mode("append").partitionBy("pb").parquet(s"$dir/quads")
      else fresh.write.mode("append").parquet(s"$dir/quads")
      phase("primary_write")
      // fresh dictionary rows: the dupIds computed above (one stored-
      // nodes scan, broadcast-flipped) drive the anti-join; above the
      // broadcast gate, fall back to the shuffle anti-join
      val freshNodes = (if (smallDelta)
        dn.join(broadcast(dupIds), dn("id") === dupIds("eid"), "left_anti")
      else dn.join(stored.nodes.select("id"), Seq("id"), "left_anti"))
        .select(stored.nodes.columns.toIndexedSeq.map(col): _*)
      freshNodes.write.mode("append").parquet(s"$dir/nodes")
      phase("nodes_write")
      // incremental stats: stored counts + appended-row counts. If the
      // store predates stats (no meta), recount once from the files.
      val merged = stored.predStats match {
        case Some(st) =>
          (st.keySet ++ appended.keySet).map(k =>
            k -> (st.getOrElse(k, 0L) + appended.getOrElse(k, 0L))).toMap
        case None =>
          spark.read.parquet(s"$dir/quads").groupBy("p").count().collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      val statsJson = merged.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(metaPath,
        s"""{"predicateBuckets":$buckets,""" +
          s""""opsIndex":${stored.quadsOps.isDefined},""" +
          s""""predStats":$statsJson}""")
    } finally {
      if (!(fresh eq dq)) fresh.unpersist()
      gatedHandle.foreach(_.unpersist())
      dupIds.unpersist(); dn.unpersist(); dq.unpersist()
    }
  }

  def read(spark: SparkSession, dir: String): Graph = {
    val metaPath = java.nio.file.Paths.get(s"$dir/graft_meta.json")
    val (buckets, stats, ops) =
      if (java.nio.file.Files.exists(metaPath)) {
        val m = java.nio.file.Files.readString(metaPath)
        val b = "\"predicateBuckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(m)
          .map(_.group(1).toInt).getOrElse(0)
        val st = "\"predStats\"\\s*:\\s*\\{([^}]*)\\}".r.findFirstMatchIn(m)
          .map(_.group(1)).filter(_.nonEmpty).map { body =>
            body.split(',').map { kv =>
              val Array(k, v) = kv.split(':')
              k.trim.stripPrefix("\"").stripSuffix("\"").toLong -> v.trim.toLong
            }.toMap
          }
        val o = "\"opsIndex\"\\s*:\\s*true".r.findFirstIn(m).isDefined
        (b, st, o)
      } else (0, None, false)
    Graph(spark.read.parquet(s"$dir/nodes"),
      spark.read.parquet(s"$dir/quads"), buckets, stats,
      quadsOps =
        if (ops) Some(spark.read.parquet(s"$dir/quads_ops")) else None)
  }

  /** Deterministically quad-ify a relational table: each row becomes
    * `(<table:pk>, <column>, typedValue)` triples. Gives graph-parity tests
    * and the DuckDB oracle a shared, SQL-expressible ground truth.
    */
  def quadifyTable(df: DataFrame, table: String, pkCol: String,
                   label: Option[String] = None): DataFrame = {
    def qv(kind: Int, s: org.apache.spark.sql.Column = lit(null).cast(StringType),
           i: org.apache.spark.sql.Column = lit(null).cast(LongType),
           d: org.apache.spark.sql.Column = lit(null).cast(DoubleType),
           b: org.apache.spark.sql.Column = lit(null).cast(BooleanType),
           t: org.apache.spark.sql.Column = lit(null).cast(LongType),
           lang: org.apache.spark.sql.Column = lit(null).cast(StringType),
           dt: org.apache.spark.sql.Column = lit(null).cast(StringType)) =
      struct(lit(kind).as("kind"), s.as("s"), i.as("i"), d.as("d"), b.as("b"),
        t.as("t"), lang.as("lang"), dt.as("dt"))

    val lbl = label match {
      case Some(l) => qv(Kind.Iri, s = lit(l))
      case None    => lit(null).cast(Values.structType)
    }
    // Stage the subject struct ONCE per row in a projection below the
    // explode: referencing a named column keeps the generated code linear
    // in the column count — inlining `subj` into every array element made
    // Janino compile (and evaluate) the same concat/struct tree per
    // attribute, a measurable slice of bulk-load time on wide tables.
    val staged = df.select((col("*") +: Seq(
      qv(Kind.Iri, s = concat(lit(table + ":"), col(pkCol).cast(StringType)))
        .as("__subj"), lbl.as("__lbl"))): _*)
    // one scan: explode an array of per-column quad structs per row
    val quadStructs = df.schema.fields.filter(_.name != pkCol).map { f =>
      val c = col(f.name)
      val obj = f.dataType match {
        case StringType => qv(Kind.Str, s = c)
        case LongType | IntegerType | ShortType =>
          qv(Kind.IntK, i = c.cast(LongType))
        case DoubleType | FloatType => qv(Kind.FloatK, d = c.cast(DoubleType))
        case BooleanType => qv(Kind.BoolK, b = c)
        case TimestampType => qv(Kind.TimeK, t = unix_micros(c))
        case DateType =>
          qv(Kind.TimeK, t = unix_micros(c.cast(TimestampType)))
        case other =>
          qv(Kind.Str, s = c.cast(StringType))
      }
      when(c.isNotNull, struct(col("__subj").as("sub"),
        qv(Kind.Iri, s = lit(f.name)).as("pred"), obj.as("obj"),
        col("__lbl").as("lbl")))
    }
    staged.select(explode(array(quadStructs.toIndexedSeq: _*)).as("q"))
      .where(col("q").isNotNull)
      .select(col("q.sub").as("sub"), col("q.pred").as("pred"),
        col("q.obj").as("obj"), col("q.lbl").as("lbl"))
  }

  /** Quadify foreign-key edges: `(<table:pk>, <edgeName>, <refTable:fk>)`. */
  def quadifyEdge(df: DataFrame, table: String, pkCol: String,
                  edgeName: String, refTable: String, fkCol: String): DataFrame = {
    def iri(c: org.apache.spark.sql.Column) =
      struct(lit(Kind.Iri).as("kind"), c.as("s"),
        lit(null).cast(LongType).as("i"), lit(null).cast(DoubleType).as("d"),
        lit(null).cast(BooleanType).as("b"), lit(null).cast(LongType).as("t"),
        lit(null).cast(StringType).as("lang"), lit(null).cast(StringType).as("dt"))
    df.where(col(fkCol).isNotNull).select(
      iri(concat(lit(table + ":"), col(pkCol).cast(StringType))).as("sub"),
      iri(lit(edgeName)).as("pred"),
      iri(concat(lit(refTable + ":"), col(fkCol).cast(StringType))).as("obj"),
      lit(null).cast(Values.structType).as("lbl"))
  }
}
