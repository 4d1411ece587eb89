package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.Traversal
import graft.importer.BinaryGraph
import graft.search.Fulltext

/** The reference CLI's full query surface over an imported
  * [[BinaryGraph]] — what a BinaryX-Graph user calls after switching
  * engines (src/commands/query.rs): `query functions|strings|binary|
  * callgraph|call-path|xrefs` and `database stats`.
  *
  * Binary scoping mirrors the Cypher `(b)-[:CONTAINS|IMPORTS]->(f)`
  * pattern as a semi-join against the membership edges; traversals
  * reuse the numeric-id [[Traversal]] primitives via a per-call uid
  * dictionary (dense longs join faster than strings at scale).
  */
class GraphQueryEngine(g: BinaryGraph) {

  /** Functions of a binary = CONTAINS ∪ IMPORTS targets. */
  private def membership: DataFrame =
    g.contains.select(col("binary_hash"), col("function_uid"))
      .unionByName(g.importsFn.select(col("binary_hash"), col("function_uid")))
      .distinct()

  /** Binaries matching `--binary` (filename contains | exact hash). */
  private def binaryMatches(pattern: String): DataFrame =
    g.binaries.filter(col("filename").contains(pattern) || col("hash") === pattern)
      .select(col("hash").as("binary_hash"))

  /** Function uids visible under an optional binary filter. */
  private def scopeUids(binary: Option[String]): DataFrame = binary match {
    case None => g.functions.select(col("uid"))
    case Some(b) =>
      membership.join(broadcast(binaryMatches(b)), "binary_hash")
        .select(col("function_uid").as("uid")).distinct()
  }

  /** `query functions --pattern` (importer.rs:322-376): substring on
    * name or uid, optional binary scope, first `limit` by uid
    * (cli.rs:65 `--limit`, default 100). */
  def queryFunctions(pattern: String, binary: Option[String] = None,
      limit: Int = 100): DataFrame =
    g.functions
      .join(scopeUids(binary), Seq("uid"), "left_semi")
      .filter(col("name").contains(pattern) || col("uid").contains(pattern))
      .orderBy("uid").limit(limit)

  /** `query binary --binary-name` (importer.rs:431-469). */
  def queryBinaryInfo(name: String): DataFrame =
    g.binaries.filter(col("hash") === name || col("filename").contains(name))
      .orderBy("hash").limit(1)

  /** Edges restricted to an optional binary scope (every endpoint
    * must be visible in the scope — the Cypher ALL(n IN nodes(path))
    * condition). */
  private def scopedCalls(binary: Option[String]): DataFrame = binary match {
    case None => g.calls
    case Some(_) =>
      val uids = scopeUids(binary)
      g.calls
        .join(uids.withColumnRenamed("uid", "from_uid"), Seq("from_uid"), "left_semi")
        .join(uids.withColumnRenamed("uid", "to_uid"), Seq("to_uid"), "left_semi")
  }

  /** (ids, edges) dictionaries cached once per binary scope — a
    * long-lived engine serving many callgraph/callPaths/findRecursion
    * calls reuses one cached pair per scope instead of leaking a new
    * cache registration per query. [[close]] releases them. */
  private val dictMemo =
    scala.collection.mutable.Map.empty[Option[String], (DataFrame, DataFrame, DataFrame)]

  /** Long ids for traversal: (uid, id) dictionary via xxhash64 —
    * embarrassingly parallel (a dense_rank over a global window would
    * single-partition sort the whole uid set at scale). A collision
    * (~n²/2⁶⁵) would silently merge two functions, so the build
    * CHECKS: if distinct(id) < distinct(uid) it falls back to a
    * zipWithIndex dictionary (exact, one extra pass). The check rides
    * on the same cache-materializing action, so it costs one small agg.
    */
  private def withIds(binary: Option[String]): (DataFrame, DataFrame) = {
    val (_, ids, e) = dictMemo.synchronized {
      dictMemo.getOrElseUpdate(binary, {
        val calls = scopedCalls(binary).cache()
        val uids = calls.select(col("from_uid").as("uid"))
          .unionByName(calls.select(col("to_uid").as("uid")))
          .distinct()
        val ids = GraphQueryEngine.uidDictionary(uids)
        val e = calls
          .join(ids.withColumnRenamed("uid", "from_uid").withColumnRenamed("id", "src"),
            Seq("from_uid"))
          .join(ids.withColumnRenamed("uid", "to_uid").withColumnRenamed("id", "dst"),
            Seq("to_uid"))
          .select(col("src"), col("dst"),
            coalesce(graft.importer.Addresses.parseAddress(col("call_offset")), lit(0L))
              .as("offset"))
        // calls rides in the memo so close() can unpersist it — the
        // dictionary build is the only consumer, but its cache
        // registration lives until explicitly released.
        (calls, ids, e.cache())
      })
    }
    (ids, e)
  }

  /** Release every cached dictionary/edge frame this engine holds.
    * The engine remains usable — the next query rebuilds its scope. */
  def close(): Unit = dictMemo.synchronized {
    dictMemo.values.foreach { case (calls, ids, e) =>
      calls.unpersist()
      ids.unpersist()
      e.unpersist()
    }
    dictMemo.clear()
  }

  private def startIds(functionName: String, binary: Option[String]): DataFrame =
    g.functions
      .filter(col("name") === functionName || col("uid") === functionName)
      .join(scopeUids(binary), Seq("uid"), "left_semi")
      .select(col("uid"))

  /** `query callgraph --max-depth` (importer.rs:471-550): DISTINCT
    * callees and callers within depth. */
  def callgraph(functionName: String, binary: Option[String] = None,
      maxDepth: Int = 3): DataFrame = {
    val (ids, e) = withIds(binary)
    val starts = startIds(functionName, binary)
      .join(ids, "uid").select(col("id").as("node"))
    val reach = Traversal.bfs(e, starts, maxDepth)
      .withColumn("direction", lit("callee"))
      .unionByName(Traversal.bfs(e, starts, maxDepth, reverse = true)
        .withColumn("direction", lit("caller")))
    reach.join(ids, reach("node") === ids("id"))
      .join(g.functions, "uid")
      .select(col("direction"), col("uid"), col("name"), col("address"), col("depth"))
      .orderBy("direction", "depth", "uid")
  }

  /** `query call-path --show-paths` (call_path_analyzer.rs:20-110). */
  def callPaths(functionName: String, binary: Option[String] = None,
      maxDepth: Int = 3): DataFrame = {
    val (ids, e) = withIds(binary)
    val starts = startIds(functionName, binary)
      .join(ids, "uid").select(col("id").as("node"))
    val w = Traversal.walks(e, starts, maxDepth)
    w.join(ids, w("start") === ids("id"))
      .select(col("uid").as("start_uid"), col("path"), col("offsets"), col("depth"))
      .orderBy("start_uid", "depth", "path")
  }

  /** `--show-sequences`: direct callees in call-site order
    * (call_path_analyzer.rs:196-251). */
  def callSequences(functionName: String, binary: Option[String] = None): DataFrame = {
    val starts = startIds(functionName, binary)
    scopedCalls(binary)
      .join(starts.withColumnRenamed("uid", "from_uid"), Seq("from_uid"), "left_semi")
      .withColumn("ord", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_uid")
          .orderBy("call_offset", "to_uid")))
      .select(col("from_uid").as("caller"), col("to_uid").as("callee"),
        col("call_offset"), col("call_type"), col("ord"))
      .orderBy("caller", "ord")
  }

  /** `--show-upward`: who calls this, in call-site order
    * (call_path_analyzer.rs:433-500). */
  def callerSequences(functionName: String, binary: Option[String] = None): DataFrame = {
    val starts = startIds(functionName, binary)
    scopedCalls(binary)
      .join(starts.withColumnRenamed("uid", "to_uid"), Seq("to_uid"), "left_semi")
      .withColumn("ord", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("to_uid")
          .orderBy("call_offset", "from_uid")))
      .select(col("to_uid").as("callee"), col("from_uid").as("caller"),
        col("call_offset"), col("call_type"), col("ord"))
      .orderBy("callee", "ord")
  }

  /** Recursion detection (call_path_analyzer.rs:253-331). */
  def findRecursion(functionName: String, binary: Option[String] = None,
      maxDepth: Int = 10): DataFrame = {
    val (ids, e) = withIds(binary)
    val starts = startIds(functionName, binary)
      .join(ids, "uid").select(col("id").as("node"))
    val rec = Traversal.recursion(e, starts, maxDepth)
    rec.join(ids, rec("node") === ids("id"))
      .join(starts.withColumnRenamed("node", "id"), Seq("id"), "left_semi")
      .select(col("uid"), col("call_type"), col("depth"), col("n_cycles"))
      .orderBy("call_type", "depth")
  }

  /** `query xrefs <address>` (importer.rs:552-602): calls touching a
    * function at the given (normalized) address, plus import-table
    * address hits. */
  def xrefs(address: String, binary: Option[String] = None): DataFrame = {
    val norm = graft.importer.Addresses
    val target = g.functions
      .filter(col("address") === norm.normalizeAddressLit(address))
      .select(col("uid"))
      .unionByName(g.importsFn
        .filter(col("address") === norm.normalizeAddressLit(address))
        .select(col("function_uid").as("uid")))
      .distinct()
    scopedCalls(binary)
      .join(broadcast(target.withColumnRenamed("uid", "t")),
        col("from_uid") === col("t") || col("to_uid") === col("t"))
      .select(col("from_uid").as("from_function"), col("to_uid").as("to_function"),
        col("call_offset"))
      .distinct()
      .orderBy("from_function", "to_function")
  }

  private def scopedStrings(binary: Option[String]): (DataFrame, DataFrame) = {
    val scoped = binary match {
      case None => g.containsString
      case Some(b) =>
        g.containsString.join(broadcast(binaryMatches(b)), "binary_hash")
    }
    val docs = g.strings
      .join(scoped.select(col("string_uid").as("uid")).distinct(), Seq("uid"), "left_semi")
      .select(col("uid").as("doc_id"), col("value").as("text"))
    (scoped, docs)
  }

  private def withSampleCount(hits: DataFrame, scoped: DataFrame): DataFrame = {
    val sampleCount = scoped.groupBy(col("string_uid").as("doc_id"))
      .agg(countDistinct("binary_hash").as("sample_count"))
    hits.join(sampleCount, "doc_id")
      .join(g.strings.withColumnRenamed("uid", "doc_id"), "doc_id")
      .select(col("doc_id").as("uid"), col("value"), col("score"), col("sample_count"))
      .orderBy(col("score").desc, col("uid"))
  }

  /** `query strings --pattern` via the distributed fulltext index
    * (importer.rs:378-429): tf-idf score + per-binary sample count.
    * Default mode mirrors the reference's
    * `default_string_fulltext_query` (query.rs:113-135): every term
    * is an infix wildcard `*term*`, terms AND-joined — so
    * `--pattern bitcoin` matches "bitcoinwallet_v2". */
  def queryStrings(terms: Seq[String], binary: Option[String] = None,
      limit: Int = 100): DataFrame = {
    val (scoped, docs) = scopedStrings(binary)
    withSampleCount(Fulltext.containsSearch(docs, terms, limit), scoped)
  }

  /** Exact-token variant of [[queryStrings]] (no wildcards). */
  def queryStringsExact(terms: Seq[String], binary: Option[String] = None,
      limit: Int = 100): DataFrame = {
    val (scoped, docs) = scopedStrings(binary)
    withSampleCount(Fulltext.search(docs, terms, limit), scoped)
  }

  /** Per-callee direct call frequency of a function
    * (call_path_analyzer.rs:160-190). */
  def callFrequencies(functionName: String, binary: Option[String] = None): DataFrame = {
    val starts = startIds(functionName, binary)
    scopedCalls(binary)
      .join(starts.withColumnRenamed("uid", "from_uid"), Seq("from_uid"), "left_semi")
      .groupBy(col("to_uid").as("callee_uid"))
      .agg(count(lit(1)).as("frequency"))
      .orderBy("callee_uid")
  }

  /** `query callgraph` enhanced form (call_path_analyzer.rs:112-193):
    * distinct reachable callees annotated with the direct-call
    * frequency (0 for transitively-reached functions). */
  def enhancedCallGraph(functionName: String, binary: Option[String] = None,
      maxDepth: Int = 3): DataFrame = {
    val callees = callgraph(functionName, binary, maxDepth)
      .filter(col("direction") === "callee")
      .select(col("uid"), col("name"), col("address"), col("depth"))
    callees
      .join(callFrequencies(functionName, binary)
        .withColumnRenamed("callee_uid", "uid"), Seq("uid"), "left")
      .withColumn("frequency", coalesce(col("frequency"), lit(0L)))
      .orderBy("depth", "uid")
  }

  /** `query call-path --show-context` (call_path_analyzer.rs:502-538):
    * upward chains + downward paths in one frame, tagged by role. */
  def analyzeCallContext(functionName: String, binary: Option[String] = None,
      maxDepth: Int = 3): DataFrame = {
    val down = callPaths(functionName, binary, maxDepth)
      .withColumn("role", lit("downward_path"))
    val (ids, e) = withIds(binary)
    val starts = startIds(functionName, binary)
      .join(ids, "uid").select(col("id").as("node"))
    val up = Traversal.walks(e, starts, maxDepth, reverse = true)
    val upNamed = up.join(ids, up("start") === ids("id"))
      .select(col("uid").as("start_uid"), col("path"), col("offsets"), col("depth"))
      .withColumn("role", lit("upward_chain"))
    down.unionByName(upNamed).orderBy("role", "start_uid", "depth", "path")
  }

  /** Context insights summary (CallContextAnalysis
    * generate_context_insights, models/call_path.rs:209-223). */
  def contextInsights(functionName: String, binary: Option[String] = None,
      maxDepth: Int = 3): DataFrame = {
    val ctx = analyzeCallContext(functionName, binary, maxDepth)
    val callers = callerSequences(functionName, binary)
    ctx.groupBy("role").agg(count(lit(1)).as("n"))
      .unionByName(callers.agg(lit("caller_sequences").as("role"),
        count(lit(1)).as("n")))
      .orderBy("role")
  }

  /** `query strings --raw`: boolean (Lucene-style) query over the
    * fulltext index (README raw-query mode). */
  def queryStringsRaw(query: String, binary: Option[String] = None,
      limit: Int = 100): DataFrame = {
    val (_, docs) = scopedStrings(binary)
    Fulltext.booleanSearch(docs, query, limit)
      .join(g.strings.withColumnRenamed("uid", "doc_id"), "doc_id")
      .select(col("doc_id").as("uid"), col("value"), col("score"), col("n_atoms"))
      .orderBy(col("score").desc, col("uid"))
  }

  /** `database stats` (importer.rs:27-80). */
  def stats(): DataFrame = graft.importer.JsonImporter.stats(g)

  // ---- whole-graph analytics (Spark-native additions; the Neo4j
  // reference has no analogue) over the optionally binary-scoped call
  // graph, results mapped back to function uids ---------------------

  /** Map a numeric-id analytics result back to function uids: joins
    * `node` against the scope's id dictionary and keeps `extra`. */
  private def mapBack(df: DataFrame, ids: DataFrame, extra: String): DataFrame =
    df.join(ids, col("node") === col("id"))
      .select(col("uid"), col(extra))

  /** Connected components of the call graph (undirected), labeled by
    * a member uid — [[graft.graph.Components.auto]] under the hood
    * (label-prop budget, alternating-star fallback). */
  def components(binary: Option[String] = None): DataFrame = {
    val (ids, e) = withIds(binary)
    mapBack(graft.graph.Components.auto(e), ids, "component")
      .join(ids.select(col("uid").as("component_uid"), col("id").as("cid")),
        col("component") === col("cid"))
      .select(col("uid"), col("component_uid"))
      .orderBy("uid")
  }

  /** Function importance via fixed-point PageRank
    * ([[graft.graph.Ranking.pageRank]]), most important first. */
  def pageRank(binary: Option[String] = None, iters: Int = 3): DataFrame = {
    val (ids, e) = withIds(binary)
    mapBack(graft.graph.Ranking.pageRank(e, iters), ids, "pagerank_ppm")
      .orderBy(col("pagerank_ppm").desc, col("uid"))
  }

  /** Dense callgraph backbone: k-core survivors with their core
    * degree ([[graft.graph.Ranking.kCoreBounded]]). */
  def kCore(k: Int = 3, binary: Option[String] = None): DataFrame = {
    val (ids, e) = withIds(binary)
    mapBack(graft.graph.Ranking.kCoreBounded(e, k), ids, "core_deg")
      .orderBy("uid")
  }

  /** Callgraph clustering structure: total triangle count
    * ([[graft.graph.Ranking.triangleCount]]). */
  def triangleCount(binary: Option[String] = None): DataFrame =
    graft.graph.Ranking.triangleCount(withIds(binary)._2)

  /** Module structure via plurality label propagation
    * ([[graft.graph.Components.communities]]) — labels by a member
    * uid, as [[components]] does for connectivity. */
  def communities(binary: Option[String] = None, rounds: Int = 4): DataFrame = {
    val (ids, e) = withIds(binary)
    mapBack(graft.graph.Components.communities(e, rounds), ids, "community")
      .join(ids.select(col("uid").as("community_uid"), col("id").as("cid")),
        col("community") === col("cid"))
      .select(col("uid"), col("community_uid"))
      .orderBy("uid")
  }

  /** Partition quality of the [[communities]] labeling: Newman Q in
    * exact integer ppm ([[graft.graph.Components.modularity]]) — one
    * (n_communities, m_edges, q_ppm) row. */
  def modularity(binary: Option[String] = None, rounds: Int = 4): DataFrame =
    graft.graph.Components.modularity(withIds(binary)._2, rounds)

  /** Macro architecture: bow-tie decomposition relative to the giant
    * SCC ([[graft.graph.Components.bowTie]]) — core = the
    * mutually-recursive engine, in = drivers, out = leaf utilities,
    * other = peripheral code. Four summary rows. */
  def bowTie(binary: Option[String] = None, depth: Int = 8): DataFrame =
    graft.graph.Components.bowTie(withIds(binary)._2, depth)

  /** Per-function local clustering
    * ([[graft.graph.Ranking.localClustering]]): how clique-like each
    * function's call neighborhood is, most clustered first. */
  def localClustering(binary: Option[String] = None): DataFrame = {
    val (ids, e) = withIds(binary)
    graft.graph.Ranking.localClustering(e)
      .join(ids, col("node") === col("id"))
      .select(col("uid"), col("degree"), col("n_tri"), col("lcc_ppm"))
      .orderBy(col("lcc_ppm").desc, col("uid"))
  }

  /** Hot-callee sparsification
    * ([[graft.graph.Ranking.sparsifyTopK]]): each function's `k`
    * heaviest call edges by call-site count, with the full
    * out-degree/out-weight so the cut's loss is visible. */
  def sparsify(binary: Option[String] = None, k: Int = 4): DataFrame = {
    val (ids, e) = withIds(binary)
    val w = e.groupBy("src", "dst").agg(count(lit(1)).as("weight"))
    graft.graph.Ranking.sparsifyTopK(w, k)
      .join(ids.select(col("id").as("src"), col("uid").as("caller_uid")), "src")
      .join(ids.select(col("id").as("dst"), col("uid").as("callee_uid")), "dst")
      .select(col("caller_uid"), col("callee_uid"), col("weight"), col("rnk"),
        col("n_edges"), col("w_total"))
      .orderBy("caller_uid", "rnk")
  }

  /** Deterministic walk corpus from every `samplePeriod`-th caller
    * ([[graft.graph.Traversal.randomWalks]]) — the graph-embedding
    * sampling pass, reproducible run-to-run; uids mapped back per
    * step. */
  def walks(binary: Option[String] = None, maxLen: Int = 6,
      samplePeriod: Int = 8): DataFrame = {
    val (ids, e) = withIds(binary)
    val starts = e.select(col("src").as("node"))
      .filter(pmod(col("node"), lit(samplePeriod.toLong)) === 0).distinct()
    graft.graph.Traversal.randomWalks(e, starts, maxLen)
      .join(ids.select(col("id").as("node"), col("uid")), "node")
      .join(ids.select(col("id").as("wid"), col("uid").as("walk_uid")),
        col("walk_id") === col("wid"))
      .select(col("walk_uid"), col("step"), col("uid"))
      .orderBy("walk_uid", "step")
  }

  /** Brokers of the call graph: sampled bounded betweenness
    * ([[graft.graph.Ranking.betweennessSampled]]) from a 1-in-
    * `samplePeriod` source sample (1 = every caller — fine for small
    * binaries, the sampling exists for corpus-scale graphs),
    * most-central first. */
  def betweenness(binary: Option[String] = None, depth: Int = 3,
      samplePeriod: Int = 8): DataFrame = {
    val (ids, e) = withIds(binary)
    val sources = e.select(col("src").as("node"))
      .filter(pmod(col("node"), lit(samplePeriod.toLong)) === 0).distinct()
    mapBack(graft.graph.Ranking.betweennessSampled(e, sources, depth),
      ids, "betweenness_ppm")
      .orderBy(col("betweenness_ppm").desc, col("uid"))
  }

  /** How much of the binary each function transitively touches:
    * exact |N_≤depth| per function ([[graft.graph.Traversal
    * .reachWithin]]); [[graft.graph.Traversal.anfApprox]] is the
    * register-state scale form. */
  def neighborhoodSizes(binary: Option[String] = None, depth: Int = 2): DataFrame = {
    val (ids, e) = withIds(binary)
    val reach = graft.graph.Traversal.reachWithin(
      e, e.select(col("src").as("node")).distinct(), depth)
      .groupBy(col("start").as("node"))
      .agg(count(lit(1)).as("n_reach"))
    mapBack(reach, ids, "n_reach").orderBy("uid")
  }

  /** Distance efficiency per function: sampled bounded closeness
    * ([[graft.graph.Ranking.closeness]]) from a 1-in-`samplePeriod`
    * caller sample, highest first. */
  def closeness(binary: Option[String] = None, depth: Int = 3,
      samplePeriod: Int = 8): DataFrame = {
    val (ids, e) = withIds(binary)
    val starts = e.select(col("src").as("node"))
      .filter(pmod(col("node"), lit(samplePeriod.toLong)) === 0).distinct()
    graft.graph.Ranking.closeness(e, starts, depth)
      .join(ids, col("node") === col("id"))
      .select(col("uid"), col("n_reach"), col("sum_dist"), col("closeness_ppm"))
      .orderBy(col("closeness_ppm").desc, col("uid"))
  }

  /** One-row call-graph shape summary: reciprocity (mutual calls),
    * global clustering (3·triangles/wedges), degree assortativity —
    * the three classic structure diagnostics in one frame. */
  def graphShape(binary: Option[String] = None): DataFrame = {
    val (_, e) = withIds(binary)
    graft.graph.Ranking.reciprocity(e)
      .crossJoin(graft.graph.Ranking.clusteringCoefficient(e)
        .select(col("n_triangles"), col("n_wedges"), col("clustering_ppm")))
      .crossJoin(graft.graph.Ranking.assortativity(e).select(col("assortativity")))
  }
}

object GraphQueryEngine {

  /** (uid → dense long id) dictionary: xxhash64, embarrassingly
    * parallel; a collision (~n²/2⁶⁵) would silently merge two
    * functions, so the build CHECKS — if distinct(id) < count(uid) it
    * falls back to an exact zipWithIndex dictionary (one extra pass).
    * The uid column is selected BY NAME on both branches, so the
    * fallback survives `uids` growing extra columns. `hash` is
    * injectable only so the fallback branch is spec-exercised
    * (a real xxhash64 collision is not constructible in a test).
    * Input must be distinct on uid; the returned frame is cached. */
  private[graft] def uidDictionary(uids: DataFrame,
      hash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        xxhash64(_)): DataFrame = {
    val hashed = uids.select(col("uid")).withColumn("id", hash(col("uid"))).cache()
    val counts = hashed
      .agg(count(lit(1)).as("n"), countDistinct("id").as("nid")).head()
    if (counts.getLong(0) == counts.getLong(1)) hashed
    else {
      hashed.unpersist()
      uids.sparkSession.createDataFrame(
        uids.select(col("uid")).rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row(r.getAs[String]("uid"), i)
        },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("uid",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))).cache()
    }
  }
}
