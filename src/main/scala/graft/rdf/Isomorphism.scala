package graft.rdf

/** Blank-node-aware graph isomorphism — the oracle predicate the W3C
  * suite uses (`RDF.Graph.isomorphic?`, /root/reference/test/acceptance/
  * w3c_test.exs:55-59). Iterative signature refinement narrows candidate
  * bnode pairings; a small backtracking search settles ties. Documents
  * in the suite are tiny, so worst-case search cost is irrelevant.
  */
object Isomorphism {

  def isomorphic(a: Set[Triple], b: Set[Triple]): Boolean = {
    if (a.size != b.size) return false
    val groundA = a.filter(t => !hasBNode(t))
    val groundB = b.filter(t => !hasBNode(t))
    if (groundA != groundB) return false
    val bnodesA = bnodes(a).toVector
    val bnodesB = bnodes(b).toVector
    if (bnodesA.size != bnodesB.size) return false
    if (bnodesA.isEmpty) return true

    val sigA = refine(a, bnodesA)
    val sigB = refine(b, bnodesB)
    val bucketsA = bnodesA.groupBy(sigA)
    val bucketsB = bnodesB.groupBy(sigB)
    if (bucketsA.keySet != bucketsB.keySet) return false
    if (bucketsA.exists { case (k, v) => bucketsB(k).size != v.size }) return false

    // most-constrained-first: smallest candidate bucket first
    val order = bnodesA.sortBy(n => bucketsA(sigA(n)).size).toList
    val nonGroundA = a.filter(hasBNode)
    val nonGroundB = b.filter(hasBNode)
    search(order, Map.empty, nonGroundA, nonGroundB, sigA, bucketsB)
  }

  private def hasBNode(t: Triple): Boolean =
    t.s.isInstanceOf[BNode] || t.p.isInstanceOf[BNode] || t.o.isInstanceOf[BNode]

  private def bnodes(g: Set[Triple]): Set[BNode] =
    g.flatMap(t => Seq(t.s, t.p, t.o)).collect { case b: BNode => b }

  /** Iterated hash refinement: signature of a bnode = sorted multiset of
    * its incident triple shapes with neighbor bnodes abstracted by their
    * previous-round signature.
    */
  private def refine(g: Set[Triple], ns: Vector[BNode]): Map[BNode, String] = {
    var sig: Map[BNode, String] = ns.map(_ -> "b").toMap
    var rounds = 0
    var changed = true
    while (changed && rounds < ns.size + 2) {
      val next = ns.map { n =>
        val parts = g.iterator.collect {
          case Triple(s, p, o) if s == n || p == n || o == n =>
            def enc(t: Term): String = t match {
              case b: BNode => if (b == n) "SELF" else "N:" + sig(b)
              case other => other.toString
            }
            s"${enc(s)}|${enc(p)}|${enc(o)}"
        }.toVector.sorted
        n -> scala.util.hashing.MurmurHash3.orderedHash(parts).toString
      }.toMap
      changed = next != sig
      sig = next
      rounds += 1
    }
    sig
  }

  private def substitute(t: Triple, m: Map[BNode, BNode]): Triple = {
    def sub(x: Term): Term = x match {
      case b: BNode => m.getOrElse(b, b)
      case other => other
    }
    Triple(sub(t.s), sub(t.p), sub(t.o))
  }

  private def bnodesOf(t: Triple): Seq[BNode] =
    Seq(t.s, t.p, t.o).collect { case b: BNode => b }

  private def search(
      remaining: List[BNode],
      mapping: Map[BNode, BNode],
      triplesA: Set[Triple],
      triplesB: Set[Triple],
      sigA: Map[BNode, String],
      bucketsB: Map[String, Vector[BNode]]
  ): Boolean = remaining match {
    case Nil =>
      triplesA.map(substitute(_, mapping)) == triplesB
    case n :: rest =>
      val used = mapping.values.toSet
      bucketsB(sigA(n)).exists { cand =>
        !used.contains(cand) && {
          val m2 = mapping + (n -> cand)
          // prune: any A-triple whose bnodes are all mapped must map to a B-triple
          val ok = triplesA.forall { t =>
            val bs = bnodesOf(t)
            if (bs.forall(m2.contains)) triplesB.contains(substitute(t, m2)) else true
          }
          ok && search(rest, m2, triplesA, triplesB, sigA, bucketsB)
        }
      }
  }
}
