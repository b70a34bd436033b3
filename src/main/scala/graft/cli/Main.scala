package graft.cli

import graft.rdf._

/**
 * CLI mirroring the reference's entry points (/root/reference/rdfx/rdfx_cli.py:155-216):
 *
 *   convert <file-or-dir>... --format <fmt> [--output <dir>] [--comments c1,c2]
 *   merge   <file-or-dir>... --format <fmt> [--output <dir>] [--filename name]
 *   clean   <file>...
 *
 * Inputs and the output directory are Hadoop-FileSystem URIs: bare local
 * paths, file://, s3a://, hdfs:// all flow through the same reader/writer
 * (reference S3 parity, persistence_systems.py:216-309).
 *
 * Divergence from the reference (documented, SURVEY §7): convert honors
 * --output (the reference silently writes next to the input, rdfx_cli.py:69-71).
 */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val method = args.head
    val rest = args.tail
    val opts = parseOpts(rest)
    val inputs = opts.positional.flatMap(RdfIo.prepareFilesListUri)
    val outDir = opts.named.getOrElse("output", ".")
    val fmt = opts.named.getOrElse("format", "ttl")
    val comments = opts.named.get("comments").map(_.split(",").toSeq).getOrElse(Nil)
    method match {
      case "convert" =>
        inputs.foreach { f =>
          val out = GraphOps.convert(f, outDir, fmt, None, comments)
          println(s"converted $f -> $out")
        }
      case "merge" =>
        val name = opts.named.getOrElse("filename", "merged")
        val out = GraphOps.mergeUris(inputs, outDir, fmt, name, comments)
        println(s"merged ${inputs.size} files -> $out")
      case "clean" =>
        inputs.foreach { f =>
          val out = GraphOps.clean(f, replicateReferenceBug = false)
          println(s"cleaned $f -> $out")
        }
      case other =>
        System.err.println(s"unknown method: $other"); usage(); sys.exit(2)
    }
  }

  private case class Opts(positional: Seq[String], named: Map[String, String])

  private def parseOpts(args: Seq[String]): Opts = {
    val named = scala.collection.mutable.Map.empty[String, String]
    val positional = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      val key = a match {
        case "--format" | "-f" => Some("format")
        case "--output" | "-o" => Some("output")
        case "--filename" | "-n" => Some("filename")
        case "--comments" | "-c" => Some("comments")
        case _ => None
      }
      key match {
        case Some(k) =>
          if (i + 1 >= args.length) { System.err.println(s"$a requires a value"); sys.exit(2) }
          named(k) = args(i + 1); i += 2
        case None => positional += a; i += 1
      }
    }
    Opts(positional.toSeq, named.toMap)
  }

  private def usage(): Unit =
    System.err.println(
      """usage: graft.cli.Main <convert|merge|clean> <files-or-dirs...>
        |  --format|-f <ttl|turtle|nt|n3|xml|json-ld>   output format
        |  --output|-o <dir>                            output directory (default .)
        |  --filename|-n <name>                         merge output name (default merged)
        |  --comments|-c <c1,c2>                        leading comments (turtle only)
        |""".stripMargin)
}
