package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession for the whole test JVM (suites run sequentially). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", s"${Tables.scratchRoot}/spark-local-test")
      .config("spark.sql.warehouse.dir", s"${Tables.scratchRoot}/warehouse-test")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
