package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer-vector kernel: `int_vec_dot_norms(a, b)` returns
  * `[dot(a,b), dot(a,a), dot(b,b)]` over two `array<bigint>` quantized
  * vectors in ONE whole-stage-codegen pass.
  *
  * Why a custom Catalyst Expression (the brief's option (b)): Spark's
  * higher-order array lambdas (`zip_with`/`aggregate`) are INTERPRETED
  * — measured ~50µs/pair on 64-dim vectors — and the relational
  * explode-join-aggregate alternative ships |pairs| × dims rows through
  * two shuffles plus a groupBy. This expression computes the same three
  * integer sums at memory speed on packed arrays: one row per pair, no
  * per-dim rows, ~2.5× less shuffle volume, and integer arithmetic so
  * results stay bit-identical across engines and partitionings.
  */
case class IntVecDotNorms(left: Expression, right: Expression)
    extends BinaryExpression {

  // input contract: both children are array<bigint> (AbstractDataType /
  // ExpectsInputTypes are private[sql], so the contract is enforced by
  // the callers in graft.pipeline, which build the quantized arrays
  // themselves; a mistyped SQL call fails at execution, not analysis)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int_vec_dot_norms"

  // Mismatched lengths (a truncated vector from a bad upstream batch):
  // the dot runs over the common prefix but each norm covers its FULL
  // vector — same semantics as the per-dimension relational form this
  // kernel replaced, so a short prefix can never score cos=1.0 against
  // its parent.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0L
    var nl = 0L
    var nr = 0L
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      val yi = y.getLong(i)
      dot += xi * yi
      nl += xi * xi
      nr += yi * yi
      i += 1
    }
    var j = n
    while (j < nx) { val v = x.getLong(j); nl += v * v; j += 1 }
    j = n
    while (j < ny) { val v = y.getLong(j); nr += v * v; j += 1 }
    new GenericArrayData(Array(dot, nl, nr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val nl = ctx.freshName("nl")
      val nr = ctx.freshName("nr")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |long $dot = 0L, $nl = 0L, $nr = 0L;
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($i);
         |  $dot += $x * $y;
         |  $nl += $x * $x;
         |  $nr += $y * $y;
         |}
         |for (int $i = $n; $i < $nx; $i++) { long $x = $a.getLong($i); $nl += $x * $x; }
         |for (int $i = $n; $i < $ny; $i++) { long $y = $b.getLong($i); $nr += $y * $y; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[]{$dot, $nl, $nr});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the graft expression library. Idempotent —
  * call before building a plan that uses the functions by name.
  */
object GraftFunctions {
  val dotNormsIdent: FunctionIdentifier = FunctionIdentifier("int_vec_dot_norms")
  private val dotNormsInfo =
    new ExpressionInfo(classOf[IntVecDotNorms].getName, "int_vec_dot_norms")
  private val dotNormsBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, s"int_vec_dot_norms expects 2 arguments, got ${children.size}")
    IntVecDotNorms(children.head, children(1))
  }

  val nfcIdent: FunctionIdentifier = FunctionIdentifier("unicode_nfc")
  private val nfcInfo =
    new ExpressionInfo(classOf[UnicodeNfc].getName, "unicode_nfc")
  private val nfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, s"unicode_nfc expects 1 argument, got ${children.size}")
    UnicodeNfc(children.head)
  }

  val mfcIdent: FunctionIdentifier = FunctionIdentifier("multi_find_count")
  private val mfcInfo =
    new ExpressionInfo(classOf[MultiFindCount].getName, "multi_find_count")
  private val mfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.size >= 2,
      s"multi_find_count expects (text, pattern, ...), got ${children.size}")
    val pats = children.tail.map { e =>
      require(e.foldable, "multi_find_count patterns must be string literals")
      e.eval() match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case other =>
          throw new IllegalArgumentException(s"pattern literal expected, got $other")
      }
    }
    MultiFindCount(children.head, pats)
  }

  val cdcIdent: FunctionIdentifier = FunctionIdentifier("cdc_boundary_ends")
  private val cdcInfo =
    new ExpressionInfo(classOf[CdcBoundaryEnds].getName, "cdc_boundary_ends")
  private val cdcBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 3,
      s"cdc_boundary_ends expects (text, width, maskBits), got ${children.size}")
    def intLit(e: Expression, what: String): Int = {
      require(e.foldable, s"cdc_boundary_ends $what must be an integer literal")
      e.eval() match {
        case i: Int => i
        case other =>
          throw new IllegalArgumentException(s"$what integer literal expected, got $other")
      }
    }
    CdcBoundaryEnds(children.head, intLit(children(1), "width"),
      intLit(children(2), "maskBits"))
  }

  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    if (!fr.functionExists(dotNormsIdent))
      fr.registerFunction(dotNormsIdent, dotNormsInfo, dotNormsBuilder)
    if (!fr.functionExists(nfcIdent))
      fr.registerFunction(nfcIdent, nfcInfo, nfcBuilder)
    if (!fr.functionExists(mfcIdent))
      fr.registerFunction(mfcIdent, mfcInfo, mfcBuilder)
    if (!fr.functionExists(cdcIdent))
      fr.registerFunction(cdcIdent, cdcInfo, cdcBuilder)
  }

  private[functions] def description =
    (dotNormsIdent, dotNormsInfo, dotNormsBuilder)

  private[functions] def nfcDescription =
    (nfcIdent, nfcInfo, nfcBuilder)

  private[functions] def mfcDescription =
    (mfcIdent, mfcInfo, mfcBuilder)

  private[functions] def cdcDescription =
    (cdcIdent, cdcInfo, cdcBuilder)
}

/** `SparkSessionExtensions` installer — the deployment-grade hook:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * the expression library available to every session on the cluster
  * (graft.pipeline code also registers lazily per session, so local use
  * needs no config).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.description)
    ext.injectFunction(GraftFunctions.nfcDescription)
    ext.injectFunction(GraftFunctions.mfcDescription)
    ext.injectFunction(GraftFunctions.cdcDescription)
  }
}
