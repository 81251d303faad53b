package graft.xml

import graft.rdf._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Encoder round-trip over the whole W3C positive corpus: decode every
  * eval fixture, re-encode with auto-derived prefixes, decode again,
  * assert isomorphism. Exercises every statement form the suite can
  * produce through the encoder (the reference's encoder tests only
  * cover hand-picked graphs).
  */
class RoundTripSpec extends AnyFunSuite {

  private val suiteDir = Paths.get("/root/reference/test/data/w3c-rdf-1.1-xml-test-suite")
  private val baseUrl = "http://www.w3.org/2013/RDFXMLTests/"

  private def prefixesFor(g: RdfGraph): Map[String, String] = {
    // derive a prefix per distinct predicate namespace so encoding never
    // fails on a missing declaration
    val nss = g.triples.iterator.flatMap { t =>
      val terms = Seq(t.p) ++ (t.o match { case i: Iri => Seq(i); case _ => Nil }) ++
        (t.s match { case i: Iri => Seq(i); case _ => Nil })
      terms.collect { case Iri(v) =>
        val cut = math.max(v.lastIndexOf('#'), v.lastIndexOf('/'))
        if (cut > 0) v.substring(0, cut + 1) else v
      }
    }.toSet
    nss.zipWithIndex.map { case (ns, i) => s"n$i" -> ns }.toMap + ("rdf" -> Vocab.rdfNs)
  }

  private val inputs = Files.walk(suiteDir).iterator().asScala
    .filter(p => p.toString.endsWith(".rdf") && !p.getFileName.toString.startsWith("error"))
    .toSeq.sortBy(_.toString)

  test("decode -> encode -> decode is isomorphic across the positive W3C corpus") {
    var roundTripped = 0
    var skippedDecode = 0
    var skippedEncode = 0
    inputs.foreach { p =>
      val rel = suiteDir.relativize(p).toString
      RdfXmlParser.parseBytes(Files.readAllBytes(p), Some(baseUrl + rel)) match {
        case Left(_) => skippedDecode += 1 // some positive-named files aren't in the run set
        case Right(g) =>
          RdfXmlEncoder.encode(g, RdfXmlEncoder.Options(prefixes = Some(prefixesFor(g)))) match {
            case Left(_) => skippedEncode += 1 // e.g. predicate not expressible as qname
            case Right(xml) =>
              RdfXmlParser.parse(xml) match {
                case Left(e) => fail(s"re-decode of $rel failed: ${e.message}\n$xml")
                case Right(g2) =>
                  assert(Isomorphism.isomorphic(g.triples, g2.triples),
                    s"round trip of $rel not isomorphic:\nORIGINAL:\n${NTriples.serialize(g.triples)}\n" +
                      s"REENCODED:\n$xml\nDECODED:\n${NTriples.serialize(g2.triples)}")
                  roundTripped += 1
              }
          }
      }
    }
    assert(roundTripped > 100, s"roundTripped=$roundTripped decodeSkips=$skippedDecode encodeSkips=$skippedEncode")
    assert(skippedEncode < 15, s"too many encode skips: $skippedEncode")
  }
}
