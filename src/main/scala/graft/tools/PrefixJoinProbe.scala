package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Ad-hoc stage-level timing for the PPJoin-family prefix joins
  * (q59 jaccardPrefixJoin / q81 containmentPrefixJoin): times each
  * sub-frame in isolation on a warmed session so optimization targets
  * the measured bottleneck (the StageProbe discipline applied to the
  * other expensive self-join family).
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prefix-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    def sink(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warm-up
    sink(Dedup.jaccardPrefixJoin(docs))

    time("full_q59")(sink(Dedup.jaccardPrefixJoin(docs)))
    time("full_q81")(sink(Dedup.containmentPrefixJoin(docs)))

    // --- q59 stages, replicated from jaccardPrefixJoin
    val explPlan = Dedup.shingleRows(docs, 3).distinct()
    time("expl_ckpt") { explPlan.localCheckpoint(true).count() }
    val expl = explPlan.localCheckpoint(true)
    val dfreq = expl.groupBy(col("s")).agg(count(lit(1)).as("c"))
    time("dfreq")(sink(dfreq))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = expl.join(dfreq, Seq("s"))
      .select(col("doc_id"), col("s"),
        row_number().over(byDoc.orderBy(col("c"), col("s"))).as("pos"),
        count(lit(1)).over(byDoc).as("sz"))
    time("ranked")(sink(ranked))
    val tNum = 1; val tDen = 2
    val minOv = (lit(tNum) * col("sz") + lit(tDen - 1)).divide(lit(tDen)).cast("long")
    val prefix = ranked
      .where(col("pos") <= col("sz") - minOv + lit(1))
      .select(col("doc_id"), col("s"), col("sz"))
    time("prefix_ckpt") { prefix.localCheckpoint(true).count() }
    val pfx = prefix.localCheckpoint(true)
    println(s"COUNT prefix=${pfx.count()} expl=${expl.count()}")
    val candIds = pfx.select(col("s"), col("doc_id").as("a"), col("sz").as("sza"))
      .join(pfx.select(col("s"), col("doc_id").as("b"), col("sz").as("szb")), Seq("s"))
      .where(col("a") < col("b") &&
        lit(tDen) * col("szb") >= lit(tNum) * col("sza") &&
        lit(tDen) * col("sza") >= lit(tNum) * col("szb"))
      .select(col("a"), col("b"))
      .distinct()
    time("cand_ckpt") { candIds.localCheckpoint(true).count() }
    val cand = candIds.localCheckpoint(true)
    println(s"COUNT cand=${cand.count()}")
    val sizes = expl.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(expl.select(col("doc_id").as("a"), col("s")), Seq("a"))
      .join(expl.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("ic"))
    time("verify_inter")(sink(inter))
    val out = inter
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), Seq("b"))
      .where(lit(tDen) * col("ic") >= lit(tNum) * (col("sza") + col("szb") - col("ic")))
    time("verify_full")(sink(out))
    spark.stop()
  }
}

/** In-session alternating A/B for the prefix-join document-frequency
  * shape: (A) count window over the shingle partition vs (B)
  * groupBy(s)+join — both feeding the same doc-partition rank window.
  * Alternation inside one JVM cancels session-level ambient drift;
  * report = min per variant.
  */
object PrefixDfAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val expl = Dedup.shingleRows(docs, 3).distinct().localCheckpoint(true)
    val byDoc = Window.partitionBy(col("doc_id"))
    def rankedA = expl
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("s"))))
      .select(col("doc_id"), col("s"),
        row_number().over(byDoc.orderBy(col("c"), col("s"))).as("pos"),
        count(lit(1)).over(byDoc).as("sz"))
    def rankedB = {
      val dfreq = expl.groupBy(col("s")).agg(count(lit(1)).as("c"))
      expl.join(dfreq, Seq("s"))
        .select(col("doc_id"), col("s"),
          row_number().over(byDoc.orderBy(col("c"), col("s"))).as("pos"),
          count(lit(1)).over(byDoc).as("sz"))
    }
    def sink(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    sink(rankedA); sink(rankedB) // warm both plan shapes
    var as = List.empty[Double]; var bs = List.empty[Double]
    (1 to 5).foreach { _ =>
      as = sink(rankedA) :: as
      bs = sink(rankedB) :: bs
    }
    println(f"AB window_df min=${as.min}%.2f all=${as.reverse.map(x => f"$x%.2f").mkString(",")}")
    println(f"AB groupby_df min=${bs.min}%.2f all=${bs.reverse.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}

/** Same alternating-A/B discipline for the pageRank/trustRank
  * out-degree shape: (A) count window over the src partition vs
  * (B) groupBy(src)+join, both checkpoint-materialized like the
  * operators do.
  */
object DegreeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pairs = orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().localCheckpoint(true)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      .select(col("src"), col("dst")).distinct().localCheckpoint(true)
    def wA = edges.withColumn("deg", count(lit(1)).over(Window.partitionBy(col("src"))))
    def wB = edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
    def t(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f.localCheckpoint(true).count(); (System.nanoTime() - t0) / 1e9
    }
    t(wA); t(wB)
    var as = List.empty[Double]; var bs = List.empty[Double]
    (1 to 5).foreach { _ => as = t(wA) :: as; bs = t(wB) :: bs }
    println(f"AB window_deg min=${as.min}%.2f all=${as.reverse.map(x => f"$x%.2f").mkString(",")}")
    println(f"AB groupby_deg min=${bs.min}%.2f all=${bs.reverse.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}

/** Alternating A/B for the verify-join shape over the REAL q59
  * candidate set: (A) b-side shingle leg broadcast vs (B) plain
  * shuffle joins (the r5 shape). Candidates and shingles are
  * checkpointed once so only the verify differs.
  */
object VerifyAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val expl = Dedup.shingleRows(docs, 3).distinct().localCheckpoint(true)
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = expl
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("s"))))
      .select(col("doc_id"), col("s"),
        row_number().over(byDoc.orderBy(col("c"), col("s"))).as("pos"),
        count(lit(1)).over(byDoc).as("sz"))
    val minOv = (lit(1) * col("sz") + lit(1)).divide(lit(2)).cast("long")
    val prefix = ranked.where(col("pos") <= col("sz") - minOv + lit(1))
      .select(col("doc_id"), col("s"), col("sz"))
    val cand = prefix.select(col("s"), col("doc_id").as("a"), col("sz").as("sza"))
      .join(prefix.select(col("s"), col("doc_id").as("b"), col("sz").as("szb")), Seq("s"))
      .where(col("a") < col("b") && lit(2) * col("szb") >= col("sza") &&
        lit(2) * col("sza") >= col("szb"))
      .select(col("a"), col("b")).distinct().localCheckpoint(true)
    println(s"cand=${cand.count()} expl=${expl.count()}")
    def inter(bleg: org.apache.spark.sql.DataFrame) = cand
      .join(expl.select(col("doc_id").as("a"), col("s")), Seq("a"))
      .join(bleg.select(col("doc_id").as("b"), col("s")), Seq("b", "s"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("ic"))
    def t(f: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    t(inter(broadcast(expl))); t(inter(expl))
    var as = List.empty[Double]; var bs = List.empty[Double]
    (1 to 5).foreach { _ => as = t(inter(broadcast(expl))) :: as; bs = t(inter(expl)) :: bs }
    println(f"AB bleg_broadcast min=${as.min}%.2f all=${as.reverse.map(x => f"$x%.2f").mkString(",")}")
    println(f"AB shuffle_joins  min=${bs.min}%.2f all=${bs.reverse.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
