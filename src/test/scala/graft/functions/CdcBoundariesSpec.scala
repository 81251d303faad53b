package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract tests for the codegen'd Buzhash CDC boundary scanner:
  * codegen/interpreted value parity, agreement with an independent
  * per-position closed-form recompute (the oracle's formulation —
  * rolling update == closed form is exactly the identity the kernel
  * rests on), short-input and null behavior, and the literal-only
  * parameter builder contract.
  */
class CdcBoundariesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("cdc-boundaries-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Independent closed-form recompute: h(i) = XOR of
    * rotl32(T[byte], k) over the trailing window — NOT the rolling
    * update the kernel uses.
    */
  private def brute(text: String, width: Int, maskBits: Int): Seq[Int] = {
    val bytes = text.getBytes("UTF-8")
    val mask = (1 << maskBits) - 1
    (width to bytes.length).filter { i =>
      val h = (0 until width).foldLeft(0) { (acc, k) =>
        acc ^ Integer.rotateLeft(CdcHasher.Table(bytes(i - 1 - k) & 0xff), k)
      }
      (h & mask) == 0
    }
  }

  private val cases = Seq(
    ("the quick brown fox jumps over the lazy dog " * 6).trim,
    "aaaaaaaaaaaaaaaaaaaaaaaa", // constant text: every window identical
    "short",                    // below width: no boundaries
    "exactly8",                 // length == width: at most one position
    "")

  private def run(codegen: Boolean): Seq[Seq[Int]] = {
    val s = spark
    import s.implicits._
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try cases.toDF("t").select(expr("cdc_boundary_ends(t, 8, 3)").as("b"))
      .as[Seq[Int]].collect().toSeq
    finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("codegen and interpreted paths agree with the closed-form recompute") {
    // maskBits 3 (p = 1/8) so the long fixtures actually hit boundaries
    val expected = cases.map(brute(_, 8, 3))
    assert(run(codegen = true) == expected, cases.zip(expected).toString)
    assert(run(codegen = false) == expected)
    // the fixture must exercise a non-empty lane or the parity is vacuous
    assert(expected.head.nonEmpty, expected.toString)
    // constant text: all windows equal, so all-or-none of the 17
    // positions are boundaries
    val const = expected(1)
    assert(const.isEmpty || const == (8 to 24).toList, const.toString)
    // below-width and empty inputs: no positions at all
    assert(expected(2).isEmpty && expected(4).isEmpty)
  }

  test("null input stays null; non-literal width rejected") {
    val s = spark
    import s.implicits._
    val out = Seq[String](null, "abcdefgh").toDF("t")
      .select(expr("cdc_boundary_ends(t, 8, 1)").as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Int](0))
    assert(out(0) == null)
    intercept[Exception] {
      Seq("x").toDF("t")
        .select(expr("cdc_boundary_ends(t, length(t), 1)")).collect()
    }
  }
}
