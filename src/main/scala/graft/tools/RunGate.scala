package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Run a single SparkEntry gate query at an arbitrary sf dir and dump it to
  * parquet — the targeted (one-query) variant of graft.Verify for local
  * driver-compare debugging: `runMain graft.tools.RunGate <name> <sfDir> <out>`.
  */
object RunGate {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
