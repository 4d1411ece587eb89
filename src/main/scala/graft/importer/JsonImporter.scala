package graft.importer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The property-graph tables produced by an analysis-JSON import —
  * the columnar re-expression of the reference's Neo4j schema
  * (models/nodes.rs, models/relationships.rs, neo4j/schema.rs):
  * one DataFrame per node/edge label, unique keys by construction.
  */
case class BinaryGraph(
    binaries: DataFrame,       // hash, filename, file_path, file_size, format, arch
    functions: DataFrame,      // uid, name, fn_type, address, size
    strings: DataFrame,        // uid, value
    libraries: DataFrame,      // name
    contains: DataFrame,       // binary_hash, function_uid
    importsFn: DataFrame,      // binary_hash, function_uid, address
    importsLib: DataFrame,     // binary_hash, library_name
    belongsTo: DataFrame,      // function_uid, library_name
    containsString: DataFrame, // binary_hash, string_uid, address
    calls: DataFrame,          // from_uid, to_uid, call_offset, call_type — ONE row per (from,to)
    callSites: DataFrame)      // same columns, one row per call SITE

/** Distributed analysis-JSON importer (SURVEY.md §2 A1–A3, A5–A6).
  *
  * The reference walks each file row-by-row against Neo4j with an
  * in-memory address→uid HashMap (api/session.rs:19-258). Here the
  * whole directory imports as ONE declarative plan: `read.json` over
  * all files, array explodes per entity, and the address→uid
  * resolution becomes two joins against a derived per-binary address
  * map — set-oriented, shuffle-partitioned by binary hash, linear in
  * input size at any scale.
  */
object JsonImporter {

  /** Read one or many analysis JSON files (reference `import json` /
    * `import directory --pattern`): one input row per file; `pattern`
    * is a filename glob applied at the SOURCE (pathGlobFilter — files
    * that don't match are never opened, reference import.rs:106-235). */
  def readAnalysis(spark: SparkSession, path: String,
      pattern: Option[String] = None): DataFrame = {
    val r = spark.read.option("multiLine", "true")
    pattern.foreach(p => r.option("pathGlobFilter", p))
    r.json(path)
  }

  /** Does a (possibly nested, dot-separated) field path exist, with
    * every array segment being an array of structs? */
  private def fieldType(df: DataFrame, path: String): Option[DataType] = {
    def walk(dt: DataType, parts: List[String]): Option[DataType] = (dt, parts) match {
      case (t, Nil) => Some(t)
      case (st: StructType, p :: rest) =>
        st.find(_.name == p).flatMap(f => walk(f.dataType, rest))
      case _ => None
    }
    walk(df.schema, path.split("\\.").toList)
  }

  /** Array-of-struct section with a usable element type? */
  private def hasField(df: DataFrame, field: String): Boolean =
    fieldType(df, field) match {
      case Some(ArrayType(_: StructType, _)) => true
      case Some(ArrayType(StringType, _)) => field == "strings"
      case _ => false
    }

  /** Reference a nested field if present, else a typed null. */
  private def optField(df: DataFrame, path: String, dt: DataType): Column =
    if (fieldType(df, path).isDefined) col(path) else lit(null).cast(dt)

  /** Build the full graph from raw analysis rows. */
  def buildGraph(raw0: DataFrame): BinaryGraph = {
    // Stable per-file binary hash, the join key for every explode.
    val sha = coalesce(optField(raw0, "binary_info.hashes.sha256", StringType),
      optField(raw0, "binary_info.hashes.SHA256", StringType))
    val raw = raw0.filter(sha.isNotNull).withColumn("_hash", sha)

    val fmt = upper(optField(raw0, "binary_info.file_type.type", StringType))
    val binaries = raw.select(
      col("_hash").as("hash"),
      coalesce(optField(raw0, "binary_info.name", StringType),
        optField(raw0, "binary_info.filename", StringType)).as("filename"),
      coalesce(optField(raw0, "binary_info.file_path", StringType), lit("")).as("file_path"),
      coalesce(optField(raw0, "binary_info.file_size", LongType).cast("long"), lit(0L))
        .as("file_size"),
      when(fmt.contains("ELF"), "Elf")
        .when(fmt.contains("MACH"), "MachO")
        .otherwise("PE").as("format"),
      coalesce(optField(raw0, "binary_info.file_type.architecture", StringType),
        lit("unknown")).as("arch"))
      .dropDuplicates("hash")

    // --- internal functions (session.rs parse_functions) ---------------
    val internal =
      if (!hasField(raw0, "functions")) emptyFns(raw0.sparkSession)
      else raw.select(col("_hash"), explode(col("functions")).as("f"))
        .select(col("_hash"),
          coalesce(col("f.name"), lit("unknown")).as("name"),
          coalesce(Addresses.parseAddress(coalesce(col("f.address"), lit("0x0"))),
            lit(0L)).as("addr"),
          col("f.size").cast("long").as("size"))
        .select(col("_hash"),
          concat(col("_hash"), lit(":"), Addresses.formatAddress(col("addr")))
            .as("uid"),
          col("name"), lit("Internal").as("fn_type"),
          Addresses.formatAddress(col("addr")).as("address"),
          col("size"), col("addr"))

    // --- imports: global `imp:lib:name` uids (nodes.rs:71-82) ----------
    val importsRaw =
      if (!hasField(raw0, "imports")) emptyImports(raw0.sparkSession)
      else raw.select(col("_hash"), explode(col("imports")).as("i"))
        .select(col("_hash"),
          col("i.name").as("name"),
          lower(col("i.library")).as("library"),
          coalesce(col("i.address"), lit("0x0")).as("iaddr"))
        .filter(col("name").isNotNull && col("library").isNotNull)
        .withColumn("uid", concat(lit("imp:"), col("library"), lit(":"), col("name")))
        .withColumn("norm_addr",
          coalesce(Addresses.normalizeAddress(col("iaddr")), col("iaddr")))

    // --- exports become Export-typed internal functions -----------------
    val exports =
      if (!hasField(raw0, "exports")) emptyFns(raw0.sparkSession)
      else raw.select(col("_hash"), explode(col("exports")).as("x"))
        .select(col("_hash"), col("x.name").as("name"),
          Addresses.parseAddress(col("x.address")).as("addr"))
        .filter(col("name").isNotNull && col("addr").isNotNull)
        .select(col("_hash"),
          concat(col("_hash"), lit(":"), Addresses.formatAddress(col("addr")))
            .as("uid"),
          col("name"), lit("Export").as("fn_type"),
          Addresses.formatAddress(col("addr")).as("address"),
          lit(null).cast("long").as("size"), col("addr"))

    // Node table: Export overwrites Internal on uid collision (the
    // reference's MERGE-then-SET import order; session.rs:203-235).
    val fnPrio = internal.withColumn("prio", lit(1))
      .unionByName(exports.withColumn("prio", lit(2)))
    val functions = fnPrio
      .withColumn("rn", row_number().over(
        Window.partitionBy("uid").orderBy(col("prio").desc, col("name"))))
      .filter(col("rn") === 1)
      .select("uid", "name", "fn_type", "address", "size")
      .unionByName(importsRaw
        .select(col("uid"), col("name"), lit("Import").as("fn_type"),
          lit(null).cast("string").as("address"), lit(null).cast("long").as("size"))
        .dropDuplicates("uid"))

    // address→uid map, priority Import > Internal > Export (HashMap
    // insert/overwrite order in session.rs:60-235).
    val addrMap = internal
      .select(col("_hash"), Addresses.formatAddress(col("addr")).as("norm_addr"),
        col("uid"), lit(2).as("prio"))
      .unionByName(importsRaw.select(col("_hash"), col("norm_addr"), col("uid"),
        lit(3).as("prio")))
      .unionByName(exports.select(col("_hash"),
        Addresses.formatAddress(col("addr")).as("norm_addr"), col("uid"),
        lit(1).as("prio")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("_hash", "norm_addr").orderBy(col("prio").desc, col("uid"))))
      .filter(col("rn") === 1)
      .select(col("_hash"), col("norm_addr"), col("uid"))

    // --- strings: content-hash uid, NUL-trimmed (nodes.rs:93-103) ------
    val stringsRaw =
      if (!hasField(raw0, "strings")) emptyStrings(raw0.sparkSession)
      else {
        val exploded = raw.select(col("_hash"), explode(col("strings")).as("s"))
        val value = exploded.schema("s").dataType match {
          case StringType => col("s")
          case _ => col("s.value")
        }
        val addr = exploded.schema("s").dataType match {
          case StringType => lit(null).cast("string")
          case _ => col("s.address")
        }
        exploded.select(col("_hash"),
          regexp_replace(value, "\\x00+$", "").as("value"),
          coalesce(Addresses.normalizeAddress(addr), addr).as("address"))
          .filter(col("value").isNotNull)
          .withColumn("uid", concat(lit("str:"), sha2(col("value"), 256)))
      }
    val strings = stringsRaw.select("uid", "value").dropDuplicates("uid")

    val libraries = importsRaw.select(col("library").as("name")).distinct()

    // --- edges ----------------------------------------------------------
    val contains = internal.select(col("_hash").as("binary_hash"),
      col("uid").as("function_uid")).distinct()
    val importsFn = importsRaw.select(col("_hash").as("binary_hash"),
      col("uid").as("function_uid"), col("norm_addr").as("address")).distinct()
    val importsLib = importsRaw.select(col("_hash").as("binary_hash"),
      col("library").as("library_name")).distinct()
    val belongsTo = importsRaw.select(col("uid").as("function_uid"),
      col("library").as("library_name")).distinct()
    val containsString = stringsRaw.select(col("_hash").as("binary_hash"),
      col("uid").as("string_uid"), col("address")).distinct()

    // --- calls: two map joins replace the per-row HashMap lookups -------
    val (calls, callSites) =
      if (!hasField(raw0, "calls"))
        (emptyCalls(raw0.sparkSession), emptyCalls(raw0.sparkSession))
      else {
        val c = raw
          .select(col("_hash"), input_file_name().as("_file"),
            posexplode(col("calls")))
          .withColumnRenamed("pos", "_pos")
          .select(col("_hash"), col("_file"), col("_pos"),
            coalesce(Addresses.normalizeAddress(col("col.from_address")),
              col("col.from_address")).as("from_norm"),
            coalesce(Addresses.normalizeAddress(col("col.to_address")),
              col("col.to_address")).as("to_norm"),
            coalesce(col("col.offset"), lit("0x0")).as("call_offset"),
            lower(coalesce(col("col.type"), lit("direct"))).as("ct"))
          .withColumn("call_type",
            when(col("ct") === "indirect", "Indirect")
              .when(col("ct") === "virtual", "Virtual")
              .when(col("ct") === "tail", "Tail")
              .otherwise("Direct"))
        val sites = c.join(addrMap.as("m1"),
            c("_hash") === col("m1._hash") && c("from_norm") === col("m1.norm_addr"))
          .select(c("_hash").as("bh"), col("_file"), col("_pos"), col("to_norm"),
            col("call_offset"), col("call_type"), col("m1.uid").as("from_uid"))
          .join(addrMap.as("m2"),
            col("bh") === col("m2._hash") && col("to_norm") === col("m2.norm_addr"))
          .select(col("from_uid"), col("m2.uid").as("to_uid"), col("call_offset"),
            col("call_type"), col("_file"), col("_pos"))
        // Reference parity: MERGE (from)-[r:CALLS]->(to) SET r.offset
        // (neo4j/importer.rs:300) keeps exactly ONE edge per (from,to)
        // with last-write-wins properties. The declarative analogue of
        // "last write" is the max (file, array-position) — the order
        // the reference's sequential import would visit.
        val deduped = sites
          .withColumn("_rn", row_number().over(
            Window.partitionBy("from_uid", "to_uid")
              .orderBy(col("_file").desc, col("_pos").desc)))
          .filter(col("_rn") === 1)
          .select("from_uid", "to_uid", "call_offset", "call_type")
        // Per-call-site table (a Spark-native addition the flat edge
        // list can't represent): one row per distinct call site.
        val perSite = sites
          .select("from_uid", "to_uid", "call_offset", "call_type")
          .dropDuplicates("from_uid", "to_uid", "call_offset")
        (deduped, perSite)
      }

    BinaryGraph(binaries, functions, strings, libraries, contains, importsFn,
      importsLib, belongsTo, containsString, calls, callSites)
  }

  /** One-call convenience: read + build (reference `import json`). */
  def importAnalysis(spark: SparkSession, path: String): BinaryGraph =
    buildGraph(readAnalysis(spark, path))

  /** Incremental re-import INTO an existing persisted store — the
    * reference's cross-session MERGE semantics (api/session.rs:19-258:
    * a second `import json` on a live database upserts, it does not
    * rebuild): load the store, import only the NEW files, upsert via
    * [[GraphStore.merge]] (new rows win per key; CALLS keeps one edge
    * per (from,to) with last-write-wins properties), persist, return
    * the merged graph. The merged plan still SCANS the store being
    * replaced, so the save lands in a sibling staging directory and
    * swaps in atomically at the end — an increment never overwrites
    * an input it is reading, and a crash mid-save leaves the original
    * store intact. Work is one import + one keyed dedup per table —
    * linear in |store| + |increment|, a normal batch job at any
    * scale. */
  def mergeAnalysis(spark: SparkSession, storeDir: String, path: String,
      pattern: Option[String] = None, partitions: Int = 32): BinaryGraph =
    mergeGraph(spark, storeDir, buildGraph(readAnalysis(spark, path, pattern)),
      partitions)

  /** [[mergeAnalysis]] body over a prebuilt increment — lets a caller
    * that already holds the delta graph (the composed [[Refresh]])
    * upsert without re-reading the input. Crash safety rides
    * [[GraphStore.promote]]: the live store is renamed aside before
    * staging swaps in, both renames are checked, and the `.old` copy
    * is dropped only after the merged store proves loadable. */
  def mergeGraph(spark: SparkSession, storeDir: String,
      incoming: BinaryGraph, partitions: Int = 32): BinaryGraph = {
    val existing = GraphStore.load(spark, storeDir)
    val merged = GraphStore.merge(existing, incoming)
    val staging = s"$storeDir.staging"
    GraphStore.clear(spark, staging)
    GraphStore.save(merged, staging, partitions)
    GraphStore.promote(spark, staging, storeDir)
    val out = GraphStore.load(spark, storeDir)
    GraphStore.dropAside(spark, storeDir)
    out
  }

  /** Pre-import validation (api/client.rs:42-81): one row per input
    * file with its error list — distributed, so a million-file
    * directory validates as one scan. */
  def validate(raw: DataFrame): DataFrame = {
    val checks: Seq[(String, Column)] = Seq(
      "binary_info is required" ->
        (if (fieldType(raw, "binary_info").isDefined) col("binary_info").isNull
         else lit(true)),
      "binary_info missing required field: name" ->
        optField(raw, "binary_info.name", StringType).isNull,
      "binary_info missing required field: file_path" ->
        optField(raw, "binary_info.file_path", StringType).isNull,
      "binary_info missing required field: file_size" ->
        optField(raw, "binary_info.file_size", LongType).isNull,
      "binary_info missing required field: file_type" ->
        (if (fieldType(raw, "binary_info.file_type").isDefined)
           col("binary_info.file_type").isNull
         else lit(true)),
      "binary_info missing required field: hashes" ->
        (if (fieldType(raw, "binary_info.hashes").isDefined)
           col("binary_info.hashes").isNull
         else lit(true)))
    val errs = array(checks.map { case (msg, cond) =>
      when(cond, msg).otherwise(lit(null))
    }: _*)
    raw.select(
        coalesce(optField(raw, "binary_info.name", StringType), lit("<unknown>"))
          .as("file"),
        filter(errs, _.isNotNull).as("errors"))
      .withColumn("valid", size(col("errors")) === 0)
  }

  /** A5 database stats over an imported graph (importer.rs:27-80). */
  def stats(g: BinaryGraph): DataFrame =
    g.binaries.agg(count(lit(1)).as("n_binaries"))
      .crossJoin(g.functions.agg(count(lit(1)).as("n_functions")))
      .crossJoin(g.strings.agg(count(lit(1)).as("n_strings")))
      .crossJoin(g.libraries.agg(count(lit(1)).as("n_libraries")))
      .crossJoin(g.calls.agg(count(lit(1)).as("n_calls")))

  /** A6 whole-graph export as JSON lines per table under `dir`
    * (commands/database.rs:92 `database export`). */
  def exportJson(g: BinaryGraph, dir: String): Unit = {
    g.binaries.write.mode("overwrite").json(s"$dir/binaries")
    g.functions.write.mode("overwrite").json(s"$dir/functions")
    g.strings.write.mode("overwrite").json(s"$dir/strings")
    g.libraries.write.mode("overwrite").json(s"$dir/libraries")
    g.contains.write.mode("overwrite").json(s"$dir/contains")
    g.importsFn.write.mode("overwrite").json(s"$dir/imports_fn")
    g.importsLib.write.mode("overwrite").json(s"$dir/imports_lib")
    g.belongsTo.write.mode("overwrite").json(s"$dir/belongs_to")
    g.containsString.write.mode("overwrite").json(s"$dir/contains_string")
    g.calls.write.mode("overwrite").json(s"$dir/calls")
    g.callSites.write.mode("overwrite").json(s"$dir/call_sites")
  }

  // empty frames with the right schemas for absent input sections
  private def emptyFns(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("_hash", StringType), StructField("uid", StringType),
        StructField("name", StringType), StructField("fn_type", StringType),
        StructField("address", StringType), StructField("size", LongType),
        StructField("addr", LongType))))
  private def emptyImports(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("_hash", StringType), StructField("name", StringType),
        StructField("library", StringType), StructField("iaddr", StringType),
        StructField("uid", StringType), StructField("norm_addr", StringType))))
  private def emptyStrings(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("_hash", StringType), StructField("value", StringType),
        StructField("address", StringType), StructField("uid", StringType))))
  private def emptyCalls(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("from_uid", StringType), StructField("to_uid", StringType),
        StructField("call_offset", StringType), StructField("call_type", StringType))))
}
