package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton compiled to a dense DFA: one
  * table lookup per input byte, no backtracking, counting EVERY
  * pattern occurrence — overlapping and nested matches included
  * (the emit counter of each state accumulates through its fail
  * chain at build time, the standard AC-to-DFA construction). Built
  * once per pattern set on the driver and shipped to executors
  * inside the expression's reference array.
  *
  * Memory is states × 256 ints — curation pattern sets are tens of
  * short strings, so tables stay KB-sized; a dictionary-scale set
  * would switch to a sparse row representation, not a different
  * algorithm.
  */
final class AcAutomaton private (delta: Array[Array[Int]], emit: Array[Int])
    extends Serializable {

  /** Total pattern occurrences in `s`, scanning raw UTF-8 bytes.
    * Byte-level matching equals character-level matching whenever
    * patterns are valid UTF-8 (a multi-byte sequence can never match
    * across a character boundary — UTF-8 is self-synchronizing).
    */
  def count(s: UTF8String): Long = {
    var st = 0
    var i = 0
    val n = s.numBytes()
    var c = 0L
    while (i < n) {
      st = delta(st)(s.getByte(i) & 0xff)
      c += emit(st)
      i += 1
    }
    c
  }
}

object AcAutomaton {
  def build(patterns: Seq[String]): AcAutomaton = {
    val pats = patterns.distinct.map(_.getBytes("UTF-8"))
    require(pats.nonEmpty && pats.forall(_.nonEmpty), "patterns must be non-empty")
    val rows = scala.collection.mutable.ArrayBuffer(Array.fill(256)(-1))
    val ends = scala.collection.mutable.ArrayBuffer(0)
    for (p <- pats) {
      var st = 0
      for (b <- p) {
        val c = b & 0xff
        if (rows(st)(c) == -1) {
          rows(st)(c) = rows.length
          rows += Array.fill(256)(-1)
          ends += 0
        }
        st = rows(st)(c)
      }
      ends(st) += 1
    }
    val fail = Array.fill(rows.length)(0)
    val emit = ends.toArray
    val q = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      val s = rows(0)(c)
      if (s == -1) rows(0)(c) = 0 else q += s
    }
    while (q.nonEmpty) {
      val u = q.dequeue()
      emit(u) += emit(fail(u))
      for (c <- 0 until 256) {
        val v = rows(u)(c)
        if (v == -1) rows(u)(c) = rows(fail(u))(c)
        else { fail(v) = rows(fail(u))(c); q += v }
      }
    }
    new AcAutomaton(rows.toArray, emit)
  }
}

/** Codegen'd multi-pattern occurrence counter:
  * `multi_find_count(text, 'p1', 'p2', ...)` — the hot kernel of
  * dictionary-driven curation scans (decontamination term hits,
  * blocklist screening, mention-candidate pre-counts). A chain of
  * per-pattern regexes or `replace`-length tricks scans the text once
  * PER PATTERN; the AC automaton scans it ONCE TOTAL, inside the same
  * whole-stage-codegen projection as the rest of the row (the brief's
  * option (b): a Scala UDF would box every row and break the span).
  *
  * Counts ALL occurrences — overlapping matches and patterns nested
  * inside other patterns each count (the q197 oracle restates this as
  * a per-position substring census). The automaton rides the
  * generated code's reference array ([[CodegenContext.addReferenceObj]]),
  * so executors get the prebuilt DFA, not a rebuild per task.
  */
case class MultiFindCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = AcAutomaton.build(patterns)

  override def dataType: DataType = LongType
  override def prettyName: String = "multi_find_count"

  override def nullSafeEval(input: Any): Any =
    ac.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAcAutomaton", ac,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiFindCount {
  /** Shared pattern inventory for q197 — spliced verbatim into the
    * oracle's VALUES list (the q36 shared-constant rule: lowercase
    * ASCII only, no quoting hazard). Deliberately includes NESTED
    * patterns (scan ⊃ can ⊃ an; order ⊃ er) so the count-all
    * semantics stay observable.
    */
  val CurationPatterns: Seq[String] =
    Seq("the", "data", "scan", "can", "an", "key", "order", "er")
}
