package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Buzhash rolling-hash content-defined-chunking boundary scanner —
  * the O(1)-per-position replacement for hashing an 8-char window
  * from scratch at every position (the md5-lambda formulation of the
  * same boundary rule measured ~10s at sf0.1; one rolling pass is a
  * table lookup + rotate + two XORs per byte). Window hash of the
  * bytes ending at 1-based position i:
  *
  *   h(i) = XOR over k in [0, width) of rotl32(T[byte(i−k)], k)
  *
  * maintained rolling as `h = rotl1(h) ^ rotl_width(T[out]) ^ T[in]`;
  * position i is a boundary when `(h & mask) == 0` (mask = 2^m − 1 ⇒
  * boundary probability 2^−m ⇒ mean chunk ≈ 2^m on top of the
  * window). Rotate-XOR mixing keeps the LOW bits of the hash fully
  * mixed — a polynomial hash mod 2^32 would make the power-of-two
  * mask test depend only on the characters' low bits.
  *
  * BYTE positions == CHAR positions only on ASCII text (the q197
  * byte==char contract); the oracle restates the closed form per
  * position with `ascii()` lookups, so both sides assume the ASCII
  * corpus. T is the shared deterministic table [[CdcHasher.Table]]
  * (murmur3-fmix of the byte value) — spliced verbatim into the
  * oracle's VALUES list (the q36 shared-constant rule).
  */
final class CdcHasher private (table: Array[Int], width: Int, mask: Int)
    extends Serializable {

  /** 1-based end positions i ∈ [width, len] whose trailing window
    * clears the mask. Empty when the text is shorter than the window.
    */
  def boundaryEnds(s: UTF8String): GenericArrayData = {
    val n = s.numBytes()
    if (n < width) return new GenericArrayData(Array.empty[Int])
    val buf = new scala.collection.mutable.ArrayBuffer[Int]
    var h = 0
    var i = 0
    while (i < width) {
      h = Integer.rotateLeft(h, 1) ^ table(s.getByte(i) & 0xff)
      i += 1
    }
    if ((h & mask) == 0) buf += width
    while (i < n) {
      h = Integer.rotateLeft(h, 1) ^
        Integer.rotateLeft(table(s.getByte(i - width) & 0xff), width) ^
        table(s.getByte(i) & 0xff)
      i += 1
      if ((h & mask) == 0) buf += i
    }
    new GenericArrayData(buf.toArray)
  }
}

object CdcHasher {
  /** Deterministic 256-entry mixing table: murmur3's finalizer over
    * the byte value — avalanche-grade, no runtime randomness (the
    * engine-wide determinism rule). The oracle embeds these EXACT
    * values as literals; change the formula only with the oracle
    * generator.
    */
  val Table: Array[Int] = Array.tabulate(256) { b =>
    var x = b * 0x9E3779B1
    x ^= x >>> 15; x *= 0x85EBCA77
    x ^= x >>> 13; x *= 0xC2B2AE3D
    x ^= x >>> 16
    x
  }

  def build(width: Int, maskBits: Int): CdcHasher = {
    require(width >= 2 && width <= 31, "width in [2,31]")
    require(maskBits >= 1 && maskBits <= 24, "maskBits in [1,24]")
    new CdcHasher(Table, width, (1 << maskBits) - 1)
  }
}

/** Codegen'd CDC boundary scanner:
  * `cdc_boundary_ends(text, width, maskBits)` → array<int> of 1-based
  * boundary end positions. The hasher rides the generated code's
  * reference array (the q197 pattern) — executors get the prebuilt
  * table, and the scan runs inside the whole-stage span (a Scala UDF
  * would box every row and break it).
  */
case class CdcBoundaryEnds(child: Expression, width: Int, maskBits: Int)
    extends UnaryExpression {

  @transient private lazy val hasher = CdcHasher.build(width, maskBits)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundary_ends"

  override def nullSafeEval(input: Any): Any =
    hasher.boundaryEnds(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCdcHasher", hasher,
      classOf[CdcHasher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.boundaryEnds($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
