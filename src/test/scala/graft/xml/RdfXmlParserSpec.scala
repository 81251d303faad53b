package graft.xml

import graft.rdf._
import org.scalatest.funsuite.AnyFunSuite

/** Unit decoder goldens transcribed from the reference's
  * /root/reference/test/unit/decoder_test.exs (Turtle-parsed expected
  * graphs rendered here as explicit triple sets).
  */
class RdfXmlParserSpec extends AnyFunSuite {

  private val eric = "http://www.w3.org/People/EM/contact#"
  private val contact = "http://www.w3.org/2000/10/swap/pim/contact#"
  private val rdf = Vocab.rdfNs

  private def decode(xml: String, base: Option[String] = None): RdfGraph =
    RdfXmlParser.parse(xml, base) match {
      case Right(g) => g
      case Left(e) => fail(s"decode failed: ${e.message}")
    }

  test("single triple with a literal as object") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:fullName>Eric Miller</contact:fullName>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(Triple(Iri(eric + "me"), Iri(contact + "fullName"), Lit.plain("Eric Miller"))))
    assert(g.prefixes == Map("contact" -> contact, "eric" -> eric, "rdf" -> rdf))
    assert(g.base.isEmpty)
  }

  test("multiple triples with literals as objects") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:fullName>Eric Miller</contact:fullName>
      |    <contact:personalTitle>Dr.</contact:personalTitle>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "fullName"), Lit.plain("Eric Miller")),
      Triple(Iri(eric + "me"), Iri(contact + "personalTitle"), Lit.plain("Dr."))
    ))
  }

  test("language-tagged literals") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <rdfs:comment xml:lang="en">Foo</rdfs:comment>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri("http://www.w3.org/2000/01/rdf-schema#comment"), Lit.lang("Foo", "en"))
    ))
  }

  test("datatyped literals") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</contact:age>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "age"), Lit.typed("42", Vocab.xsdNs + "integer"))
    ))
  }

  test("parseType=Literal keeps exact whitespace (decoder_test.exs:99-132)") {
    val g = decode("""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      | xmlns:ex="http://example.org/stuff/1.0/">
      |  <rdf:Description rdf:about="http://example.org/item01">
      |    <ex:prop rdf:parseType="Literal" xmlns:a="http://example.org/a#">
      |      <a:Box required="true">
      |        <a:widget size="10"/>
      |        <a:grommit id="23"/>
      |      </a:Box>
      |    </ex:prop>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    val expectedLex =
      "\n      <a:Box required=\"true\">\n        <a:widget size=\"10\"/>\n        <a:grommit id=\"23\"/>\n      </a:Box>\n    "
    assert(g.triples == Set(
      Triple(
        Iri("http://example.org/item01"),
        Iri("http://example.org/stuff/1.0/prop"),
        Lit(expectedLex, Vocab.rdfXmlLiteral, "")
      )
    ))
  }

  test("parseType=Other consumes the subtree and emits nothing") {
    val g = decode("""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      | xmlns:ex="http://example.org/stuff/1.0/">
      |  <rdf:Description rdf:about="http://example.org/item01">
      |    <ex:prop rdf:parseType="Other" xmlns:a="http://example.org/a#">
      |      <a:Box required="true">
      |        <a:widget size="10"/>
      |      </a:Box>
      |    </ex:prop>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples.isEmpty)
  }

  test("rdf:resource object") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:mailbox rdf:resource="mailto:e.miller123(at)example"/>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "mailbox"), Iri("mailto:e.miller123(at)example"))
    ))
  }

  test("rdf:resource with additional property attributes describes the object") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:ex="http://example.org/" xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:mailbox rdf:resource="mailto:e.miller123(at)example"
      |       rdf:type="${contact}Mailbox"
      |       ex:p="foo"
      |     />
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    val mb = Iri("mailto:e.miller123(at)example")
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "mailbox"), mb),
      Triple(mb, Iri(Vocab.rdfType), Iri(contact + "Mailbox")),
      Triple(mb, Iri("http://example.org/p"), Lit.plain("foo"))
    ))
  }

  test("nested node element as object") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:mailbox>
      |      <rdf:Description rdf:about="mailto:e.miller123(at)example">
      |      </rdf:Description>
      |    </contact:mailbox>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "mailbox"), Iri("mailto:e.miller123(at)example"))
    ))
  }

  test("reified triple via rdf:ID on a resource property element (decoder_test.exs:247-277)") {
    val g = decode(
      s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:mailbox rdf:ID="reify">
      |      <rdf:Description rdf:about="mailto:e.miller123(at)example">
      |      </rdf:Description>
      |    </contact:mailbox>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin,
      base = Some("http://example.org/#")
    )
    val s = Iri(eric + "me")
    val p = Iri(contact + "mailbox")
    val o = Iri("mailto:e.miller123(at)example")
    val r = Iri("http://example.org/#reify")
    assert(g.triples == Set(
      Triple(s, p, o),
      Triple(r, Iri(Vocab.rdfType), Iri(Vocab.rdfStatement)),
      Triple(r, Iri(Vocab.rdfSubject), s),
      Triple(r, Iri(Vocab.rdfPredicate), p),
      Triple(r, Iri(Vocab.rdfObject), o)
    ))
  }

  test("short description form with property attribute") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <contact:Person rdf:about="${eric}me" contact:fullName="Eric Miller" />
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(Vocab.rdfType), Iri(contact + "Person")),
      Triple(Iri(eric + "me"), Iri(contact + "fullName"), Lit.plain("Eric Miller"))
    ))
  }

  test("duplicate descriptions collapse via set semantics (decoder_test.exs:300-333)") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:fullName>Eric Miller</contact:fullName>
      |  </rdf:Description>
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:mailbox rdf:resource="mailto:e.miller123(at)example"/>
      |  </rdf:Description>
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:personalTitle>Dr.</contact:personalTitle>
      |  </rdf:Description>
      |  <rdf:Description rdf:about="${eric}me">
      |    <rdf:type rdf:resource="${contact}Person"/>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(Vocab.rdfType), Iri(contact + "Person")),
      Triple(Iri(eric + "me"), Iri(contact + "fullName"), Lit.plain("Eric Miller")),
      Triple(Iri(eric + "me"), Iri(contact + "mailbox"), Iri("mailto:e.miller123(at)example")),
      Triple(Iri(eric + "me"), Iri(contact + "personalTitle"), Lit.plain("Dr."))
    ))
  }

  test("property attributes on rdf:Description") {
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me" contact:fullName="Eric Miller">
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "fullName"), Lit.plain("Eric Miller"))
    ))
  }

  test("xml:base is stored on the graph and resolves relative refs (decoder_test.exs:355-375)") {
    val base = "http://www.w3.org/People/EM/contact"
    val g = decode(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xml:base="$base" xmlns:contact="$contact" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="#me" contact:fullName="Eric Miller">
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.base.contains(base))
    assert(g.triples == Set(
      Triple(Iri(base + "#me"), Iri(contact + "fullName"), Lit.plain("Eric Miller"))
    ))
  }

  test("relative URI without base is an error (decoder_test.exs:377-386)") {
    val r = RdfXmlParser.parse(s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="#me" contact:fullName="Eric Miller">
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(r.isLeft)
  }

  test("unresolved branching bug regression (decoder_test.exs:401-415)") {
    val g = decode("""<?xml version="1.0" encoding="UTF-8"?>
      |<rdf:RDF
      |    xmlns:ex="http://example.com/#"
      |    xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
      |    <ex:Foo rdf:about="http://exmple.com/#Thing">
      |        <ex:foo></ex:foo>
      |        <ex:bar></ex:bar>
      |        <ex:baz>foo</ex:baz>
      |    </ex:Foo>
      |</rdf:RDF>
      |""".stripMargin)
    val s = Iri("http://exmple.com/#Thing")
    assert(g.triples == Set(
      Triple(s, Iri(Vocab.rdfType), Iri("http://example.com/#Foo")),
      Triple(s, Iri("http://example.com/#foo"), Lit.plain("")),
      Triple(s, Iri("http://example.com/#bar"), Lit.plain("")),
      Triple(s, Iri("http://example.com/#baz"), Lit.plain("foo"))
    ))
  }

  test("rdf:li renumbering with nested containers") {
    val g = decode(s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf">
      |  <rdf:Seq rdf:about="http://example.org/seq">
      |    <rdf:li>one</rdf:li>
      |    <rdf:li>two</rdf:li>
      |    <rdf:li>three</rdf:li>
      |  </rdf:Seq>
      |</rdf:RDF>
      |""".stripMargin)
    val s = Iri("http://example.org/seq")
    assert(g.triples == Set(
      Triple(s, Iri(Vocab.rdfType), Iri(rdf + "Seq")),
      Triple(s, Iri(rdf + "_1"), Lit.plain("one")),
      Triple(s, Iri(rdf + "_2"), Lit.plain("two")),
      Triple(s, Iri(rdf + "_3"), Lit.plain("three"))
    ))
  }

  test("parseType=Collection builds an rdf:first/rdf:rest list") {
    val g = decode(s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:ex="http://example.org/">
      |  <rdf:Description rdf:about="http://example.org/s">
      |    <ex:items rdf:parseType="Collection">
      |      <rdf:Description rdf:about="http://example.org/a"/>
      |      <rdf:Description rdf:about="http://example.org/b"/>
      |    </ex:items>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    val first = Iri(Vocab.rdfFirst)
    val rest = Iri(Vocab.rdfRest)
    val cells = g.triples.collect { case Triple(c: BNode, `first`, _) => c }
    assert(cells.size == 2)
    assert(g.triples.exists { case Triple(_, `rest`, Iri(Vocab.rdfNil)) => true; case _ => false })
    assert(g.size == 5) // head stmt + 2x(first,rest)
  }

  test("empty parseType=Collection yields rdf:nil") {
    val g = decode(s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:ex="http://example.org/">
      |  <rdf:Description rdf:about="http://example.org/s">
      |    <ex:items rdf:parseType="Collection"></ex:items>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri("http://example.org/s"), Iri("http://example.org/items"), Iri(Vocab.rdfNil))
    ))
  }

  test("parseType=Resource produces an implicit bnode subject") {
    val g = decode(s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:eg="http://example.org/">
      |  <rdf:Description rdf:about="http://example.org/resource1/">
      |    <eg:property rdf:parseType="Resource">
      |      <eg:property2>bar</eg:property2>
      |    </eg:property>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    val b = BNode("b0")
    assert(g.triples == Set(
      Triple(Iri("http://example.org/resource1/"), Iri("http://example.org/property"), b),
      Triple(b, Iri("http://example.org/property2"), Lit.plain("bar"))
    ))
  }

  test("bnode labels are deterministic and rdf:nodeID-keyed") {
    val xml = s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:eg="http://example.org/">
      |  <rdf:Description>
      |    <eg:p1 rdf:nodeID="a"/>
      |  </rdf:Description>
      |  <rdf:Description rdf:nodeID="a">
      |    <eg:p2>x</eg:p2>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin
    val g1 = decode(xml)
    val g2 = decode(xml)
    assert(g1 == g2)
    // the generated subject bnode and the keyed nodeID bnode share a counter
    val subj = BNode("b0")
    val keyed = BNode("b1")
    assert(g1.triples == Set(
      Triple(subj, Iri("http://example.org/p1"), keyed),
      Triple(keyed, Iri("http://example.org/p2"), Lit.plain("x"))
    ))
  }

  test("whitespace-only text wins the literal alternation (branch-priority semantics)") {
    val g = decode(s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:eg="http://example.org/">
      |  <rdf:Description rdf:about="http://example.org/s"><eg:p> </eg:p></rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(g.triples == Set(
      Triple(Iri("http://example.org/s"), Iri("http://example.org/p"), Lit.plain(" "))
    ))
  }

  test("decode_from_stream: chunked decode equals whole-string decode (decoder_test.exs:417-442)") {
    val xml = s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me">
      |    <contact:fullName>Eric Miller</contact:fullName>
      |    <contact:personalTitle>Dr.</contact:personalTitle>
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin
    // awkward 17-byte chunk boundaries (stricter than the reference's
    // per-line chunks) — pulled lazily, never concatenated up front
    val g = RdfXmlParser.parseChunks(xml.getBytes("UTF-8").grouped(17))
      .fold(e => fail(e.message), identity)
    assert(g.triples == Set(
      Triple(Iri(eric + "me"), Iri(contact + "fullName"), Lit.plain("Eric Miller")),
      Triple(Iri(eric + "me"), Iri(contact + "personalTitle"), Lit.plain("Dr."))))
    assert(g.triples == decode(xml).triples)
    assert(g.prefixes == decode(xml).prefixes)
  }

  test("duplicate attribute in one element is a parse error (decoder_test.exs:390-399)") {
    // The reference SKIPS its version of this test because Saxy silently
    // keeps the first occurrence; Xerces enforces XML well-formedness
    // (the behavior the reference authors wanted per their TODO note) —
    // we pin the strict side.
    val xml = s"""<?xml version="1.0" encoding="utf-8"?>
      |<rdf:RDF xmlns:contact="$contact" xmlns:eric="$eric" xmlns:rdf="$rdf">
      |  <rdf:Description rdf:about="${eric}me" contact:fullName="Eric Miller" contact:fullName="Foo">
      |  </rdf:Description>
      |</rdf:RDF>
      |""".stripMargin
    assert(RdfXmlParser.parse(xml).isLeft)
  }

  test("duplicate rdf:ID is an error") {
    val r = RdfXmlParser.parse(
      s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:eg="http://example.org/">
      |  <rdf:Description rdf:ID="x"><eg:p>1</eg:p></rdf:Description>
      |  <rdf:Description rdf:ID="x"><eg:p>2</eg:p></rdf:Description>
      |</rdf:RDF>
      |""".stripMargin,
      Some("http://example.org/doc")
    )
    assert(r.isLeft)
  }

  test("old RDF 1.0 terms are rejected") {
    val r = RdfXmlParser.parse(s"""<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="$rdf" xmlns:eg="http://example.org/">
      |  <rdf:Description rdf:aboutEach="http://example.org/s"><eg:p>1</eg:p></rdf:Description>
      |</rdf:RDF>
      |""".stripMargin)
    assert(r.isLeft)
  }
}
