package graft

import org.apache.spark.sql.DataFrame

import graft.importer.{GraphStore, JsonImporter}
import graft.queries.GraphQueryEngine

/** Command-line facade mirroring the reference CLI surface
  * (src/cli.rs, README "Basic Usage") so a BinaryX-Graph user can run
  * the same commands against the Spark engine:
  *
  * {{{
  * graft.Cli --store /warehouse import json analysis.json
  * graft.Cli --store /warehouse import directory ./analyses
  * graft.Cli --store /warehouse query functions --pattern main [--binary sample.exe]
  * graft.Cli --store /warehouse query strings --pattern "bitcoin wallet"
  * graft.Cli --store /warehouse query binary --binary-name sample.exe
  * graft.Cli --store /warehouse query callgraph main --max-depth 3
  * graft.Cli --store /warehouse query call-path main --show-paths|--show-sequences|--show-upward|--show-context
  * graft.Cli --store /warehouse query xrefs 0x401000
  * graft.Cli --store /warehouse database stats|export <dir>|clear
  * }}}
  *
  * Output is JSON lines on stdout (the reference's `--format json`).
  */
object Cli {

  private def opt(args: Seq[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Seq(`name`, v) => v }

  def main(rawArgs: Array[String]): Unit = {
    val args = rawArgs.toSeq
    val store = opt(args, "--store").getOrElse(
      sys.error("--store <dir> is required"))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    val rest = args.dropWhile(_ != "--store").drop(2) match {
      case s if s.nonEmpty => s
      case _ => args.takeWhile(_ != "--store")
    }

    def engine = new GraphQueryEngine(GraphStore.load(spark, store))
    def emit(df: DataFrame): Unit =
      df.toJSON.collect().foreach(println)

    rest match {
      case Seq("import", "json", path, _*) =>
        val g = JsonImporter.importAnalysis(spark, path)
        GraphStore.save(g, store)
        emit(JsonImporter.stats(g))
      case Seq("import", "directory", dir, _*) =>
        val raw = JsonImporter.readAnalysis(spark, dir, opt(args, "--pattern"))
        val invalid = JsonImporter.validate(raw).filter("NOT valid")
        // boolean flag: contains(), not opt() — a trailing --no-validate
        // has no following token for the sliding-window opt() to match
        if (!args.contains("--no-validate") && !invalid.isEmpty) {
          System.err.println("[warn] invalid inputs:")
          emit(invalid)
        }
        val g = JsonImporter.buildGraph(raw)
        GraphStore.save(g, store)
        emit(JsonImporter.stats(g))
      case Seq("query", "functions", _*) =>
        emit(engine.queryFunctions(opt(args, "--pattern").getOrElse(""),
          opt(args, "--binary")))
      case Seq("query", "strings", _*) =>
        val pattern = opt(args, "--pattern").getOrElse("")
        if (args.contains("--raw"))
          emit(engine.queryStringsRaw(pattern, opt(args, "--binary")))
        else {
          val terms = pattern.toLowerCase.split("[^a-z0-9]+")
            .filter(_.nonEmpty).toSeq
          emit(engine.queryStrings(terms, opt(args, "--binary")))
        }
      case Seq("query", "binary", _*) =>
        emit(engine.queryBinaryInfo(opt(args, "--binary-name").getOrElse("")))
      case Seq("query", "callgraph", fn, _*) =>
        emit(engine.callgraph(fn, opt(args, "--binary"),
          opt(args, "--max-depth").map(_.toInt).getOrElse(3)))
      case Seq("query", "call-path", fn, _*) =>
        val depth = opt(args, "--max-depth").map(_.toInt).getOrElse(3)
        if (args.contains("--show-sequences")) emit(engine.callSequences(fn, opt(args, "--binary")))
        else if (args.contains("--show-upward")) emit(engine.callerSequences(fn, opt(args, "--binary")))
        else if (args.contains("--show-context")) emit(engine.analyzeCallContext(fn, opt(args, "--binary"), depth))
        else emit(engine.callPaths(fn, opt(args, "--binary"), depth))
      case Seq("query", "xrefs", addr, _*) =>
        emit(engine.xrefs(addr, opt(args, "--binary")))
      case Seq("database", "stats", _*) =>
        emit(engine.stats())
      case Seq("database", "export", out, _*) =>
        JsonImporter.exportJson(GraphStore.load(spark, store), out)
        println(s"""{"exported":"$out"}""")
      case Seq("database", "clear", _*) =>
        GraphStore.clear(spark, store)
        println("""{"cleared":true}""")
      case other =>
        sys.error(s"unknown command: ${other.mkString(" ")}")
    }
    spark.stop()
  }
}
