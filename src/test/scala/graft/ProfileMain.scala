package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler (test scope; not part of the library).
  * Usage: sbt "Test/runMain graft.ProfileMain <query> [reps]" */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    val q = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      printf("[prof] %s run%d %.2f s (%d rows)%n", name, i,
        (System.nanoTime() - t0) / 1e9, n)
    }
    spark.stop()
  }
}
