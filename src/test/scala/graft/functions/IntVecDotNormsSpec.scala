package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract tests for the codegen'd integer-vector kernel
  * `int_vec_dot_norms`: value parity between the whole-stage-codegen
  * path and the interpreted `nullSafeEval` fallback, agreement with a
  * plain Scala reference implementation, and the null / length-mismatch
  * edge semantics the pipeline callers rely on.
  */
class IntVecDotNormsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("int-vec-dot-norms-spec")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ref(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    // dot over the common prefix; each norm over its FULL vector (a
    // truncated vector must never score cos=1.0 against its parent)
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    Seq(dot, a.map(x => x * x).sum, b.map(y => y * y).sum)
  }

  private def run(codegen: Boolean, rows: Seq[(Seq[Long], Seq[Long])]): Seq[Seq[Long]] = {
    val s = spark
    import s.implicits._
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    // factoryMode alone does NOT disable whole-stage codegen — without
    // this the "interpreted" leg still runs doGenCode and nullSafeEval
    // is never exercised
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      rows.toDF("a", "b")
        .select(expr("int_vec_dot_norms(a, b)").as("r"))
        .as[Seq[Long]].collect().toSeq
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  private val cases = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, -5L, 6L)),
    (Seq.empty[Long], Seq.empty[Long]),
    (Seq(1000000L, -1000000L), Seq(1000000L, 1000000L)), // micro-unit scale, fits long
    (Seq(7L), Seq(7L, 8L, 9L)), // length mismatch → prefix dot, full norms
    (Seq.tabulate(64)(i => (i * 2654435761L) % 2000001L - 1000000L),
     Seq.tabulate(64)(i => (i * 40503L) % 2000001L - 1000000L))
  )

  test("codegen and interpreted paths agree with the Scala reference") {
    val expected = cases.map { case (a, b) => ref(a, b) }
    assert(run(codegen = true, cases) == expected)
    assert(run(codegen = false, cases) == expected)
  }

  test("null input yields null (BinaryExpression null-safety)") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT int_vec_dot_norms(CAST(NULL AS array<bigint>), array(1L, 2L)) AS r")
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("the kernel executes inside a WholeStageCodegen span (no interpreted fallback)") {
    GraftFunctions.register(spark)
    // spark.range source (a literal Seq would constant-fold to a
    // LocalTableScan and never exercise doGenCode at runtime)
    val df = spark.range(2)
      .select(array(col("id") + 1, col("id") * 2).as("a"), array(col("id") + 3, col("id") + 4).as("b"))
      .select(expr("int_vec_dot_norms(a, b)").as("r"))
    // codegen stages render as `*(n) Project ...` in simpleString; the
    // kernel's Project must carry the star, or codegen fell back
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("int_vec_dot_norms") && l.trim.startsWith("*(")),
      s"kernel fell out of codegen:\n$plan")
    // id=0: [1,0]·[3,4]=3 ; id=1: [2,2]·[4,5]=18
    assert(df.collect().map(_.getSeq[Long](0).head).sorted.toSeq == Seq(3L, 18L))
  }

  test("registration is idempotent and survives re-register") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT int_vec_dot_norms(array(2L,3L), array(4L,5L)) AS r")
      .collect().head.getSeq[Long](0)
    assert(r == Seq(2L * 4 + 3 * 5, 4L + 9, 16L + 25))
  }
}
