package graft.xml

import graft.rdf._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Replays the official W3C RDF 1.1 XML test suite the same way the
  * reference does (/root/reference/test/acceptance/w3c_test.exs):
  * eval cases decode with base = canonical test URL and bnode prefix
  * "j", compared by graph isomorphism against the .nt golden; negative
  * cases must error. The 8 intentional-non-conformance skips are
  * mirrored from w3c_test.exs:21-46.
  */
class W3cSuiteSpec extends AnyFunSuite {

  private val suiteDir = Paths.get("/root/reference/test/data/w3c-rdf-1.1-xml-test-suite")
  private val baseUrl = "http://www.w3.org/2013/RDFXMLTests/"

  private val skips = Set(
    "rdf-element-not-mandatory-test001",
    "rdfms-syntax-incomplete-test004",
    "rdf-ns-prefix-confusion-test0010",
    "rdf-ns-prefix-confusion-test0011",
    "rdf-ns-prefix-confusion-test0012",
    "rdf-ns-prefix-confusion-test0013",
    "rdf-ns-prefix-confusion-test0014",
    "xml-canon-test001"
  )

  final case class Case(name: String, kind: String, action: String, result: Option[String])

  /** Minimal reader for this specific manifest.ttl: '#'-commented lines
    * are dropped (some entries are deliberately commented out), then
    * entry blocks are scanned for type / mf:action / mf:result.
    */
  private def manifestCases: Seq[Case] = {
    val text = new String(Files.readAllBytes(suiteDir.resolve("manifest.ttl")), "UTF-8")
    val active = text.linesIterator.filterNot(_.trim.startsWith("#")).mkString("\n")
    val entryRe = """(?s)<#([^>]+)>\s+a\s+rdft:(TestXMLEval|TestXMLNegativeSyntax)\s*;(.*?)\s\.""".r
    val actionRe = """mf:action\s+<([^>]+)>""".r
    val resultRe = """mf:result\s+<([^>]+)>""".r
    entryRe.findAllMatchIn(active).map { m =>
      val body = m.group(3)
      Case(
        m.group(1),
        m.group(2),
        actionRe.findFirstMatchIn(body).map(_.group(1)).getOrElse(sys.error(s"no action for ${m.group(1)}")),
        resultRe.findFirstMatchIn(body).map(_.group(1))
      )
    }.toSeq
  }

  private val cases = manifestCases
  private val evalCases = cases.filter(_.kind == "TestXMLEval")
  private val negCases = cases.filter(_.kind == "TestXMLNegativeSyntax")

  test("manifest has the expected number of cases") {
    // 122 active eval + 40 active negative entries (manifest.ttl lists
    // 128+41 but comments several out, e.g. rdfms-xml-literal-namespaces-*)
    assert(evalCases.size == 122, s"eval cases: ${evalCases.size}")
    assert(negCases.size == 40, s"negative cases: ${negCases.size}")
  }

  evalCases.foreach { c =>
    if (skips.contains(c.name)) ignore(s"W3C eval ${c.name} (intentional non-conformance)") {}
    else
      test(s"W3C eval ${c.name}") {
        val input = Files.readAllBytes(suiteDir.resolve(c.action))
        val base = baseUrl + c.action
        val decoded = RdfXmlParser.parseBytes(input, Some(base), bnodePrefix = "j")
        decoded match {
          case Left(err) => fail(s"decode failed: ${err.message}")
          case Right(graph) =>
            val goldenPath = suiteDir.resolve(c.result.get)
            val golden = NTriples.parse(new String(Files.readAllBytes(goldenPath), "UTF-8"))
            assert(
              Isomorphism.isomorphic(graph.triples, golden),
              s"\nGOT:\n${NTriples.serialize(graph.triples.toSeq.sortBy(_.toString))}\nEXPECTED:\n${NTriples.serialize(golden.toSeq.sortBy(_.toString))}"
            )
        }
      }
  }

  negCases.foreach { c =>
    test(s"W3C negative ${c.name}") {
      val input = Files.readAllBytes(suiteDir.resolve(c.action))
      val base = baseUrl + c.action
      RdfXmlParser.parseBytes(input, Some(base)) match {
        case Left(_) => succeed
        case Right(g) =>
          fail(s"expected error, got ${g.size} triples:\n${NTriples.serialize(g.triples)}")
      }
    }
  }
}
