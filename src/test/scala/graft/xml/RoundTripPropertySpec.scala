package graft.xml

import graft.rdf._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style round-trip fuzzing: 300 deterministic pseudo-random
  * graphs (seeded — no wall-clock randomness) must survive
  * decode(encode(g)) ≅ g, and the streaming encoder must agree with the
  * batch encoder byte-for-byte modulo line separators. Covers term-kind
  * mixes (IRIs, bnodes, plain/lang/typed literals), XML-escaping-heavy
  * lexical forms, shared objects, bnode-to-bnode edges and type short
  * forms that the hand-written goldens don't enumerate.
  */
class RoundTripPropertySpec extends AnyFunSuite {

  private val ex = "http://example.com/"

  // XML-legal text alphabet, deliberately escape-heavy; no \r (XML
  // parsers normalize \r\n → \n, which is XML semantics, not a codec bug)
  private val textAlphabet =
    "abc XYZ 09&<>\"'\n\täöü€–☃".toCharArray

  private def genLit(r: java.util.Random): Term = r.nextInt(3) match {
    case 0 =>
      val n = r.nextInt(12)
      Lit.plain((0 until n).map(_ => textAlphabet(r.nextInt(textAlphabet.length))).mkString)
    case 1 => Lit.lang("v" + r.nextInt(100), if (r.nextBoolean()) "en" else "de-AT")
    case _ => Lit.typed(r.nextInt(1000).toString, Vocab.xsdNs + "integer")
  }

  private def genSubj(r: java.util.Random): Term =
    if (r.nextInt(4) == 0) BNode("b" + r.nextInt(4)) else Iri(ex + "s" + r.nextInt(6))

  private def genObj(r: java.util.Random): Term = r.nextInt(4) match {
    case 0 => Iri(ex + "o" + r.nextInt(6))
    case 1 => BNode("b" + r.nextInt(4))
    case _ => genLit(r)
  }

  private def genPred(r: java.util.Random): Iri =
    if (r.nextInt(6) == 0) Iri(Vocab.rdfType) else Iri(ex + "p" + r.nextInt(5))

  private def genGraph(seed: Int): RdfGraph = {
    val r = new java.util.Random(seed)
    val n = 1 + r.nextInt(25)
    val triples = (0 until n).map { _ =>
      val p = genPred(r)
      // rdf:type objects must be IRIs for the short form to kick in
      val o = if (p.value == Vocab.rdfType) Iri(ex + "T" + r.nextInt(3)) else genObj(r)
      Triple(genSubj(r), p, o)
    }.toSet
    RdfGraph(triples, prefixes = Map("ex" -> ex, "rdf" -> Vocab.rdfNs))
  }

  test("decode(encode(g)) is isomorphic to g for 300 seeded random graphs") {
    (1 to 300).foreach { seed =>
      val g = genGraph(seed)
      val xml = RdfXmlEncoder.encode(g).fold(e => fail(s"seed $seed encode: ${e.message}"), identity)
      val back = RdfXmlParser.parse(xml)
        .fold(e => fail(s"seed $seed decode: ${e.message}\n$xml"), identity)
      assert(Isomorphism.isomorphic(back.triples, g.triples),
        s"seed $seed not isomorphic:\n$xml\nin:  ${g.triples}\nout: ${back.triples}")
    }
  }

  test("stream and batch encoders agree for 100 seeded random graphs") {
    (1 to 100).foreach { seed =>
      val g = genGraph(seed)
      val batch = RdfXmlEncoder.encode(g).toOption.get
      val streamed = RdfXmlEncoder.stream(g).mkString
      assert(streamed.replace(">\n", ">").stripSuffix("\n") == batch.replace(">\n", ">"),
        s"seed $seed stream/batch divergence")
    }
  }
}
