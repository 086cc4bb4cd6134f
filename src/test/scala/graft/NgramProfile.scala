package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-level CPU profiler for dedup_ngram (test scope; the
  * r14 follow-up to the bimodality work: 25 task-CPU-seconds at sf0.1
  * looks an order too high for 640 k postings + 1.2 M pair rows —
  * attribute the CPU to a stage before optimizing anything).
  * Usage: sbt "Test/runMain graft.NgramProfile [sfDir]" */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"${Tables.scratchRoot}/spark-local")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchRoot}/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration): Unit
      })
    spark.range(1000000).selectExpr("sum(id)").collect()

    // run the registered query once so the scratch postings exist
    SparkEntry.queries("dedup_ngram")(spark, sfDir).count()

    val g = spark.read.parquet(
      s"${Tables.scratchRoot}/ngram_g/${ops.Llm.Scratch.key(sfDir)}")
    def stage(label: String)(body: => Long): Unit = {
      // min-of-2 wall, task delta from the second run (warm pages)
      val w1t0 = System.nanoTime(); body
      val w1 = (System.nanoTime() - w1t0) / 1e9
      val m0 = taskMs.get
      val t0 = System.nanoTime(); val n = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[nprof] $label%-28s wall $w1%6.2f/$wall%6.2f s  " +
        f"task ${taskMs.get - m0}%7d ms  rows $n%d")
    }
    val dfCap = 16
    stage("scan g")(g.count())
    val dfTab = g.groupBy("source", "lang", "gram_h")
      .agg(count(lit(1)).as("df")).where(col("df") <= dfCap)
    stage("dfTab agg")(dfTab.count())
    val gk = g.join(dfTab, Seq("source", "lang", "gram_h"))
    stage("gk join-back")(gk.count())
    val sizes = gk.groupBy("doc_id").agg(count(lit(1)).as("n"))
    stage("sizes")(sizes.count())
    val gp = gk.where(col("df") >= 2)
    val a = gp.select(col("doc_id").as("a_id"), col("source"), col("lang"),
      col("gram_h"))
    val b = gp.select(col("doc_id").as("b_id"), col("source"), col("lang"),
      col("gram_h"))
    val inter = a.join(b, Seq("source", "lang", "gram_h"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    stage("pair join+agg")(inter.count())
    stage("full query")(
      SparkEntry.queries("dedup_ngram")(spark, sfDir).count())

    // ---- numeric-key variants: fold (source, lang) into one 64-bit key
    val gq = g.select(col("doc_id"),
      xxhash64(col("source"), col("lang"), col("gram_h")).as("k"))
    val dfTab2 = gq.groupBy("k").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap)
    stage("dfTab agg [k]")(dfTab2.count())
    val gk2 = gq.join(dfTab2, Seq("k"))
    stage("gk join-back [k]")(gk2.count())
    val gp2 = gk2.where(col("df") >= 2)
    val inter2 = gp2.select(col("doc_id").as("a_id"), col("k"))
      .join(gp2.select(col("doc_id").as("b_id"), col("k")), Seq("k"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    stage("pair join+agg [k]")(inter2.count())
    spark.stop()
  }
}
