package graft.tools

import graft.rdf.NTriples
import graft.xml.RdfXmlParser
import java.nio.file.{Files, Paths}

/** Command-line decode: RDF/XML file → N-Triples on stdout.
  *
  * Usage: RdfXmlCli <file.rdf> [baseIri] [bnodePrefix]
  * Exit 0 on success, 1 on parse error (message on stderr) — the CLI
  * face of the library's decode entry point.
  */
object RdfXmlCli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: RdfXmlCli <file.rdf> [baseIri] [bnodePrefix]"); sys.exit(2) }
    val bytes = Files.readAllBytes(Paths.get(args(0)))
    val base = args.lift(1)
    val prefix = args.lift(2).getOrElse("b")
    RdfXmlParser.parseBytes(bytes, base, prefix) match {
      case Right(g) =>
        println(NTriples.serialize(g.triples.toSeq.sortBy(_.toString)))
        System.err.println(s"# ${g.size} triples; base=${g.base.getOrElse("-")}; prefixes=${g.prefixes.keys.toSeq.sorted.mkString(",")}")
      case Left(e) =>
        System.err.println(s"parse error: ${e.message}")
        sys.exit(1)
    }
  }
}
