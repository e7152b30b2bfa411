package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** One scaling measurement in a clean JVM: warmup build (JIT + codegen),
  * then the timed build. Launched by Bench as a separate java process per
  * parallelism level, OR via real spark-submit (the master then comes from
  * the submit command — e.g. `--master local-cluster[4,2,2048]` for a
  * genuine multi-executor-JVM cluster at a chosen size; the `cpus` arg is
  * only used for the standalone-fallback `local[cpus]` master and the app
  * name). Prints `SCALE_RESULT <seconds>`.
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, warmCorpusDir, indexDir, cpus) = args
    val b = SparkSession.builder()
      .appName(s"psispark-scale-$cpus")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // under spark-submit the master (e.g. local-cluster[N,C,M]) comes from
    // the submit command; standalone fallback = in-process local[cpus]
    val spark = (if (sys.props.contains("spark.master")) b
                 else b.master(s"local[$cpus]")).getOrCreate()
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
