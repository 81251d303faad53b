package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Mutation battery over the WHOLE island-extraction surface — the
  * 100 TB input is arbitrary crawl HTML, so `Extract.triplesOf` must
  * always return its Either (RDF/XML island errors → Left, malformed
  * RDFa/microdata/JSON-LD islands → skipped or partial) and never
  * throw: an escape would fail whole extraction tasks instead of
  * incrementing one page's lineage error count. Deterministic
  * mutations only (the engine determinism rule).
  */
class ExtractFuzzSpec extends AnyFunSuite {

  // one page exercising ALL FOUR island parsers
  private val page =
    """<html><head>
      |<script type="application/ld+json">{"@context":{"@vocab":"http://s/"},"@id":"http://e/x","name":"N"}</script>
      |</head><body>
      |<div itemscope itemtype="http://schema.org/Person"><span itemprop="name">Ann</span></div>
      |<div vocab="http://xmlns.com/foaf/0.1/" typeof="Person"><span property="name">Bob</span></div>
      |<script type="application/rdf+xml"><rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:dc="http://purl.org/dc/elements/1.1/">
      |<rdf:Description rdf:about="http://e/doc"><dc:title>T</dc:title></rdf:Description>
      |</rdf:RDF></script>
      |</body></html>""".stripMargin.getBytes("UTF-8")

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed * 2654435761L + 31)(s =>
      s * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("unmutated composite page extracts from every island family") {
    val rows = Extract.triplesOf("http://fuzz.example/p", page).toOption.get
    val preds = rows.map(_.pred).toSet
    assert(preds.exists(_.endsWith("title")), preds.toString)          // RDF/XML
    assert(preds.exists(_.contains("schema.org/name")), preds.toString) // microdata
    assert(preds.exists(_.contains("foaf")), preds.toString)            // RDFa
    assert(preds.exists(_.startsWith("http://s/")), preds.toString)     // JSON-LD
  }

  test("mutated crawl pages never escape the Either lane") {
    val n = page.length
    val hostile = Array[Byte]('<', '>', '&', '"', '{', 0, '%')
    var left = 0; var right = 0
    val r = lcg(7)
    val muts = Seq.newBuilder[Array[Byte]]
    for (f <- Seq(3, 11, 23, 37, 52, 68, 81, 94, 99))
      muts += page.take(math.max(1, n * f / 100))
    for (i <- 0 until 48) {
      val pos = math.floorMod(r.next(), n.toLong).toInt
      val b = page.clone(); b(pos) = hostile(i % hostile.length); muts += b
    }
    for (i <- 0 until 16) {
      val pos = math.floorMod(r.next(), n.toLong).toInt
      muts += (page.take(pos) ++ page.drop(pos + 1))
      muts += (page.take(pos) ++ page.slice(pos, math.min(n, pos + 24)) ++ page.drop(pos))
    }
    for (i <- 0 until 8) {
      val a = math.floorMod(r.next(), (n / 2).toLong).toInt
      val b = n / 2 + math.floorMod(r.next(), (n / 2).toLong).toInt
      muts += (page.take(a) ++ page.slice(b, n) ++ page.slice(a, b))
    }
    muts += (page ++ Array[Byte](-1, -2, -60))
    muts.result().foreach { m =>
      try Extract.triplesOf("http://fuzz.example/p", m) match {
        case Right(rows) => right += 1; assert(rows != null)
        case Left(msg)   => left += 1; assert(msg != null)
      }
      catch {
        case t: Throwable =>
          fail(s"uncaught ${t.getClass.getName} on ${m.length}-byte mutation: ${t.getMessage}")
      }
    }
    // both lanes must be exercised: many mutations keep a parseable
    // island set (Right), corrupted RDF/XML islands go Left
    assert(right > 20 && left > 5, s"right=$right left=$left")
  }
}
