package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** One scaling measurement in a clean JVM: warmup build (JIT + codegen),
  * then the timed build. Launched by Bench as a separate java process per
  * parallelism level — the sandbox equivalent of separate spark-submit runs
  * at two cluster sizes (no shared heap, no cross-run GC debt).
  * Prints `SCALE_RESULT <seconds>`.
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, warmCorpusDir, indexDir, cpus) = args
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"psispark-scale-$cpus")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = IndexConfig(docsPerShard = 2048, buildPartitions = 64)
    // buildFast resumes from stage markers since r2 — a timing rep MUST
    // start from zero, so wipe any previous rep's artifacts first
    for (d <- Seq(indexDir, s"$indexDir-warm"))
      graft.FsUtil.deleteRecursively(d)
    IndexBuilder.buildFast(spark, warmCorpusDir, s"$indexDir-warm", cfg)
    val t0 = System.nanoTime()
    IndexBuilder.buildFast(spark, corpusDir, indexDir, cfg)
    println(f"SCALE_RESULT ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
