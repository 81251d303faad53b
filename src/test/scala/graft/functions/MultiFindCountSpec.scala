package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract tests for the codegen'd Aho–Corasick `multi_find_count`
  * expression: codegen/interpreted value parity, agreement with a
  * brute-force per-position census, count-ALL semantics on
  * overlapping and nested patterns, null passthrough, and the
  * literal-only pattern builder contract.
  */
class MultiFindCountSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("multi-find-count-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val pats = Seq("scan", "can", "an", "aa", "the")
  private val cases = Seq(
    "scan the table",      // scan+can+an (nested) + the = 4
    "aaa",                 // self-overlapping "aa" at 2 positions
    "banana scanner",      // an@b(2), scan+can+an, an@scanner? banana: an,an; scanner: scan,can,an
    "no hits here",        // "he" not a pattern; "the"? absent
    "")

  private def brute(text: String): Long =
    pats.map { p =>
      (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length))
    }.sum.toLong

  private def run(codegen: Boolean): Seq[Long] = {
    val s = spark
    import s.implicits._
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    val call = s"multi_find_count(t, ${pats.map(p => s"'$p'").mkString(", ")})"
    try cases.toDF("t").select(expr(call).as("n")).as[Long].collect().toSeq
    finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("codegen and interpreted paths agree with the per-position census") {
    val expected = cases.map(brute)
    assert(run(codegen = true) == expected, cases.zip(expected).toString)
    assert(run(codegen = false) == expected)
    // pin the overlap semantics explicitly, not just parity
    assert(brute("scan the table") == 4L)   // scan, can, an, the
    assert(brute("aaa") == 2L)              // aa@0 and aa@1 overlap
  }

  test("null input stays null; non-literal pattern rejected") {
    val s = spark
    import s.implicits._
    val out = Seq[String](null, "the").toDF("t")
      .select(expr("multi_find_count(t, 'the')").as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(out.toSeq == Seq(null, 1L))
    intercept[Exception] {
      Seq("x").toDF("t").select(expr("multi_find_count(t, t)")).collect()
    }
  }
}
