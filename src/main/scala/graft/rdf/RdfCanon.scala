package graft.rdf

import scala.collection.mutable

/** RDFC-1.0-style canonical blank-node labeling for ONE graph — the
  * n-degree recursion that resolves bnodes the first-degree hash
  * cannot distinguish (automorphic or locally indistinguishable
  * nodes). This is the per-graph local pass behind
  * `TripleOps.canonicalBNodeQuads`'s collision lane: graphs whose
  * bnodes all have unique first-degree hashes never reach this code
  * (the relational lane labels them), and the rare collision graphs
  * are small per-document graphs, so a whole-graph recursive
  * algorithm inside one task is the scale-correct shape (the same
  * argument as `graphDigest`'s bounded per-graph collect).
  *
  * Follows the structure of the W3C RDFC-1.0 (URDNA2015) algorithm —
  * hash-first-degree, issue unique hashes in hash order, then resolve
  * each shared-hash group via the recursive hash-n-degree pass with
  * gossip-path permutations — but over this engine's own documented
  * first-degree line scheme (`_:a` self / `_:z` other, space-joined
  * s p o lines, md5 over the newline-joined byte-sorted multiset),
  * NOT the spec's canonical-N-Quads serialization: the contract here
  * is determinism + isomorphism invariance of the relabeled quad
  * set, not byte-level RDFC conformance (the official test suite is
  * not available in-container to pin it). Reference contract:
  * Graph.isomorphic? (rdf_core graph.ex) is the pairwise form of the
  * same structural-identity relation.
  *
  * Determinism notes:
  *  - All orderings are unsigned-UTF-8-byte string order — the same
  *    order Spark's `sort_array`/comparisons and DuckDB's binary
  *    collation use, so the local first-degree hashes are
  *    byte-identical to the relational lane's (spec-pinned).
  *  - For truly automorphic bnodes the algorithm picks one of the
  *    equivalent assignments; any such choice relabels to the SAME
  *    canonical quad set (that is what an automorphism is), so the
  *    operator output — the relabeled quads — is a pure function of
  *    graph structure even there.
  *  - The permutation search is factorial in the worst case (the
  *    known RDFC "poison graph" shape); a work budget bounds it and
  *    exhaustion THROWS (the q26 converge-or-throw rule: an
  *    unverifiable labeling must never ship under an oracle gate).
  */
object RdfCanon {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes(Utf8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Unsigned UTF-8 byte order — matches Spark's UTF8String binary
    * comparison and DuckDB's default collation (the engine-identical
    * string-min rule, q9/q16/q17). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(Utf8); val y = b.getBytes(Utf8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
  private val Utf8Ord: Ordering[String] =
    (a: String, b: String) => if (utf8Lt(a, b)) -1 else if (utf8Lt(b, a)) 1 else 0

  private def isB(t: String) = t.startsWith("_:")

  private final class Budget(var left: Long) {
    def spend(n: Long, what: String): Unit = {
      left -= n
      if (left < 0) throw new IllegalStateException(
        "RdfCanon: work budget exhausted during " + what +
          " — poison-shaped automorphism group; refusing an unverified labeling")
    }
  }

  /** Mutable label issuer (RDFC "identifier issuer"): stable ids in
    * issuance order, copyable for the permutation search. */
  private final class Issuer(prefix: String, private var n: Int) {
    val issued: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty
    def issue(b: String): String =
      issued.getOrElseUpdate(b, { val id = prefix + n; n += 1; id })
    def copyOf(): Issuer = {
      val c = new Issuer(prefix, n); c.issued ++= issued; c
    }
  }

  /** Canonical label map (`input bnode label -> _:c{i}`) for the
    * bnodes of one graph's triple set. Deterministic; invariant (at
    * the relabeled-quad-set level) under any bijective relabeling of
    * the input bnodes. Throws on budget exhaustion. */
  def canonicalLabels(quads: Seq[(String, String, String)],
      budgetOps: Long = 500000L): Map[String, String] = {
    val budget = new Budget(budgetOps)
    val qs = quads.distinct
    val nodes = qs.flatMap(q => Seq(q._1, q._3)).filter(isB).distinct
    if (nodes.isEmpty) return Map.empty
    // one pass: each mentioning quad lands once per distinct mentioned
    // bnode (a self-mention quad contributes ONE entry — the o-branch
    // excludes s == o, matching the relational lane's line multiset)
    val mentions: Map[String, Seq[(String, String, String)]] = {
      val m = mutable.HashMap.empty[String, mutable.ListBuffer[(String, String, String)]]
      qs.foreach { q =>
        if (isB(q._1)) m.getOrElseUpdate(q._1, mutable.ListBuffer.empty) += q
        if (isB(q._3) && q._3 != q._1) m.getOrElseUpdate(q._3, mutable.ListBuffer.empty) += q
      }
      m.view.mapValues(_.toSeq).toMap
    }

    // first-degree hash — byte-identical to the relational lane: one
    // line per mentioning quad (a self-mention quad contributes ONE
    // line), self = _:a, other bnodes = _:z, byte-sorted, \n-joined
    val fd: Map[String, String] = nodes.iterator.map { bn =>
      val lines = mentions(bn).map { case (s, p, o) =>
        def t(x: String) = if (x == bn) "_:a" else if (isB(x)) "_:z" else x
        t(s) + " " + p + " " + t(o)
      }.sorted(Utf8Ord)
      budget.spend(lines.size, "first-degree hashing")
      bn -> md5Hex(lines.mkString("\n"))
    }.toMap

    val canon = new Issuer("_:c", 0)
    val byHash = nodes.groupBy(fd).toSeq.sortBy(_._1)(Utf8Ord)
    // unique-hash bnodes first, in hash order (matches the relational
    // lane's row_number-over-hash labeling on collision-free graphs)
    byHash.foreach { case (_, ns) => if (ns.size == 1) canon.issue(ns.head) }

    def relatedId(related: String, issuer: Issuer): String =
      canon.issued.getOrElse(related,
        issuer.issued.getOrElse(related, fd(related)))

    def hashNDegree(id: String, issuer0: Issuer): (String, Issuer) = {
      budget.spend(1, "n-degree recursion")
      var issuer = issuer0
      // related-hash -> adjacent unresolved-position bnodes
      val hn = mutable.HashMap.empty[String, mutable.TreeSet[String]]
      mentions(id).foreach { case (s, p, o) =>
        Seq((s, "s"), (o, "o")).foreach { case (term, pos) =>
          if (isB(term) && term != id) {
            val h = md5Hex(pos + " " + p + " " + relatedId(term, issuer))
            hn.getOrElseUpdate(h, mutable.TreeSet.empty[String](Utf8Ord)) += term
          }
        }
      }
      val data = new StringBuilder
      hn.keys.toSeq.sorted(Utf8Ord).foreach { rh =>
        data ++= rh
        var chosenPath: String = null
        var chosenIssuer: Issuer = null
        hn(rh).toSeq.permutations.foreach { perm =>
          budget.spend(perm.size.toLong, "permutation search")
          var cur = issuer.copyOf()
          val path = new StringBuilder
          val recurse = mutable.ListBuffer.empty[String]
          var dead = false
          perm.foreach { rel =>
            if (!dead) {
              canon.issued.get(rel) match {
                case Some(cid) => path ++= cid
                case None =>
                  if (!cur.issued.contains(rel)) recurse += rel
                  path ++= cur.issue(rel)
              }
              if (chosenPath != null && path.length >= chosenPath.length &&
                  utf8Lt(chosenPath, path.toString)) dead = true
            }
          }
          if (!dead) recurse.foreach { rel =>
            if (!dead) {
              val (h2, ri) = hashNDegree(rel, cur)
              path ++= cur.issue(rel)
              path ++= "<"; path ++= h2; path ++= ">"
              cur = ri
              if (chosenPath != null && path.length >= chosenPath.length &&
                  utf8Lt(chosenPath, path.toString)) dead = true
            }
          }
          if (!dead && (chosenPath == null || utf8Lt(path.toString, chosenPath))) {
            chosenPath = path.toString
            chosenIssuer = cur
          }
        }
        data ++= chosenPath
        issuer = chosenIssuer
      }
      (md5Hex(data.toString), issuer)
    }

    // resolve shared-hash groups in hash order: each unissued member
    // seeds a temp issuer, results order by their n-degree hash, and
    // every temp-issued bnode gets its canonical id in temp-issuance
    // order (automorphic ties resolve to SOME order — any of them
    // relabels to the identical quad set)
    byHash.foreach { case (_, ns) =>
      if (ns.size > 1) {
        val results = ns.filterNot(canon.issued.contains).map { bn =>
          val temp = new Issuer("_:t", 0)
          temp.issue(bn)
          hashNDegree(bn, temp)
        }
        results.sortBy(_._1)(Utf8Ord).foreach { case (_, iss) =>
          iss.issued.keys.foreach(canon.issue)
        }
      }
    }
    canon.issued.toMap
  }

  /** Relabel one graph's quads through [[canonicalLabels]]. The
    * relabeling is a bijection on labels, so the distinct quad count
    * is preserved. */
  def canonicalQuads(quads: Seq[(String, String, String)],
      budgetOps: Long = 500000L): Seq[(String, String, String)] = {
    val m = canonicalLabels(quads, budgetOps)
    quads.distinct.map { case (s, p, o) =>
      (m.getOrElse(s, s), p, m.getOrElse(o, o))
    }
  }
}
