package graft.cli

import graft.rdf._
import java.nio.file.{Files, Path, Paths}

/**
 * CLI mirroring the reference's entry points (/root/reference/rdfx/rdfx_cli.py:155-216):
 *
 *   convert <file-or-dir>... --format <fmt> [--output <dir>] [--comments c1,c2]
 *   merge   <file-or-dir>... --format <fmt> [--output <dir>] [--filename name]
 *   clean   <file>...
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
    val inputs = opts.positional.map(Paths.get(_)).flatMap(RdfIo.prepareFilesList)
    val outDir = Paths.get(opts.named.getOrElse("output", "."))
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
        val out = GraphOps.merge(inputs, outDir, fmt, name, comments)
        println(s"merged ${inputs.size} files -> $out")
      case "clean" =>
        inputs.foreach { f =>
          val out = GraphOps.clean(f)
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
