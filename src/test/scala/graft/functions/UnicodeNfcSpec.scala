package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract tests for the codegen'd `unicode_nfc` expression: value
  * parity between the whole-stage-codegen path and the interpreted
  * `nullSafeEval` fallback, agreement with `java.text.Normalizer`
  * directly, null passthrough, and the allocation-free fast path for
  * already-normalized input. All non-ASCII is spelled as \u escapes so
  * the fixture's composed-vs-decomposed intent survives any editor.
  */
class UnicodeNfcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("unicode-nfc-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val cases = Seq(
    "plain ascii text",
    "Cafe\u0301 au lait", // decomposed: e + combining acute -> U+00E9
    "caf\u00e9 already composed", // NFC fixed point
    "d\u0307\u0323 reorder", // dot-above then dot-below: NFC reorders to U+1E0D + U+0307
    "\u212b angstrom sign", // singleton: ANGSTROM SIGN -> U+00C5
    "A\u030a ring", // A + combining ring -> U+00C5
    "mixed Cafe\u0301 and caf\u00e9 and \u212b",
    "" // empty
  )

  private def run(codegen: Boolean): Seq[String] = {
    val s = spark
    import s.implicits._
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    // factoryMode alone does NOT disable whole-stage codegen — without
    // this the "interpreted" leg still runs doGenCode and nullSafeEval
    // is never exercised
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try cases.toDF("t").select(expr("unicode_nfc(t)").as("n")).as[String].collect().toSeq
    finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("codegen and interpreted paths agree with java.text.Normalizer") {
    val expected = cases.map(Normalizer.normalize(_, Normalizer.Form.NFC))
    assert(run(codegen = true) == expected)
    assert(run(codegen = false) == expected)
    // pin the composed forms themselves, not just engine parity
    assert(expected(1) == "Caf\u00e9 au lait")
    assert(expected(3) == "\u1e0d\u0307 reorder")
    assert(expected(4) == "\u00c5 angstrom sign")
    assert(expected(5) == "\u00c5 ring")
  }

  test("null input stays null; already-NFC input returns the same object (no allocation)") {
    val s = spark
    import s.implicits._
    val out = Seq[String](null, "ok").toDF("t")
      .select(expr("unicode_nfc(t)").as("n")).as[String].collect().toSeq
    assert(out == Seq(null, "ok"))
    val in = org.apache.spark.unsafe.types.UTF8String.fromString("ascii stays put")
    assert(UnicodeNfc.normalize(in) eq in)
  }
}
