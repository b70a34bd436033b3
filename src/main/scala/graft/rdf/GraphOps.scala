package graft.rdf

import graft.model._
import java.nio.file.{Path, Paths}

/**
 * Driver-level graph operations mirroring the reference CLI surface
 * (/root/reference/rdfx/rdfx_cli.py): convert, merge, clean. These are the
 * small-file entry points; the distributed equivalents over Dataset[TripleRow]
 * live in graft.rdf.DistributedRdf (convert/merge at parquet scale).
 */
object GraphOps {

  /**
   * convert (rdfx_cli.py:61-71): parse input (format inferred), serialize to
   * the target format. Output filename defaults to the input stem. Unlike the
   * reference — which silently writes next to the input, ignoring the output
   * dir (rdfx_cli.py:69-71, a documented quirk) — this honors `outputDir`.
   */
  def convert(inputFile: Path, outputDir: Path, outputFormatToken: String,
              outputFilename: Option[String] = None,
              leadingComments: Seq[String] = Nil): Path = {
    val (_, g) = RdfIo.readFile(inputFile)
    val stem = {
      val n = inputFile.getFileName.toString
      val dot = n.lastIndexOf('.')
      if (dot > 0) n.substring(0, dot) else n
    }
    RdfIo.writeFile(g, outputDir, outputFilename.getOrElse(stem), outputFormatToken, leadingComments)
  }

  /**
   * merge (rdfx_cli.py:74-94): parse N files into one graph — set-union, so
   * duplicate triples across files collapse; blank-node labels are kept
   * file-scoped by salting with a per-file ordinal (rdflib parses each file
   * with fresh bnode ids — same observable behavior). Default output name
   * "merged" (rdfx_cli.py:199-202).
   */
  def merge(files: Seq[Path], outputDir: Path, outputFormatToken: String,
            outputFilename: String = "merged",
            leadingComments: Seq[String] = Nil): Path = {
    files.foreach { f =>
      val name = f.getFileName.toString
      val suffix = name.substring(name.lastIndexOf('.') + 1)
      if (!RdfFormat.fileEndings.exists(_._1 == suffix))
        throw new IllegalArgumentException(
          s"Files to be merged must end with a known RDF file extension, got: $name")
    }
    val merged = files.zipWithIndex.map { case (f, i) =>
      val (_, g) = RdfIo.readFile(f)
      ParsedGraph(g.triples.map(saltBnodes(_, s"f$i")), g.prefixes)
    }.foldLeft(ParsedGraph.empty)(_ union _)
    RdfIo.writeFile(merged, outputDir, outputFilename, outputFormatToken, leadingComments)
  }

  private def saltBnodes(t: Triple, salt: String): Triple = {
    def f(term: RdfTerm): RdfTerm =
      if (term.isBNode) term.copy(value = s"${salt}_${term.value}") else term
    Triple(f(t.s), t.p, f(t.o))
  }

  /**
   * clean (rdfx_cli.py:106-152): preserve leading comments, prune prefix
   * bindings to those whose namespace IRI occurs in any term, sort bindings
   * by prefix, re-serialize as Turtle in place.
   *
   * The reference has a bug here — it re-serializes the ORIGINAL graph, so
   * pruning/sorting is unobservable in v0.4.11 (rdfx_cli.py:150-152). The
   * intended semantics are implemented here (and are observable: unused
   * @prefix bindings disappear); `replicateReferenceBug = true` reproduces
   * the v0.4.11 behavior for strict parity runs.
   */
  def clean(inputFile: Path, replicateReferenceBug: Boolean = false): Path = {
    val doc = new String(java.nio.file.Files.readAllBytes(inputFile), "UTF-8")
    val (comments, _) = RdfIo.scrapeComments(doc)
    val g = TurtleCodec.parse(doc)
    val cleaned =
      if (replicateReferenceBug) g
      else {
        val used = g.prefixes.filter { case (_, ns) =>
          g.triples.exists(t =>
            Seq(t.s, t.p, t.o).exists(term => !term.isLiteral && term.value.contains(ns)) ||
              (t.o.isLiteral && t.o.dtype != null && t.o.dtype.contains(ns)))
        }
        ParsedGraph(g.triples, used)
      }
    val dir = Option(inputFile.getParent).getOrElse(Paths.get("."))
    val name = inputFile.getFileName.toString
    val stem = if (name.contains('.')) name.substring(0, name.lastIndexOf('.')) else name
    java.nio.file.Files.deleteIfExists(inputFile)
    RdfIo.writeFile(cleaned, dir, stem, "turtle", comments)
  }
}
