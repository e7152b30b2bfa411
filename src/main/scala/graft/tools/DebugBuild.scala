package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexConfig}

/** Diagnostic main: run buildFast with a stage listener printing per-stage
  * wall time and task counts — for finding non-scaling stages.
  * Usage: runMain graft.tools.DebugBuild <corpusDir> <indexDir> <cpus>
  */
object DebugBuild {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, indexDir, master) = args
    val jar = sys.env.getOrElse("SPARK_GRAFT_JAR",
      getClass.getProtectionDomain.getCodeSource.getLocation.getPath)
    val spark = SparkSession.builder()
      .master(if (master.forall(_.isDigit)) s"local[$master]" else master)
      .config("spark.jars", jar)
      .config("spark.executor.memory", "4g")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = for (s <- i.submissionTime; e <- i.completionTime) yield (e - s) / 1000.0
        System.err.println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d " +
          f"${dur.getOrElse(-1.0)}%7.2f s  ${i.name.take(70)}")
      }
    })
    // in-session warmup: executors register, fetch the jar, and compile
    // codegen once before the timed run (cluster startup is not job
    // throughput)
    sys.env.get("SPARK_GRAFT_WARM_CORPUS").foreach { wc =>
      IndexBuilder.buildFast(spark, wc, s"$indexDir-warm",
        IndexConfig(docsPerShard = 2048, buildPartitions = 64))
    }
    val t0 = System.nanoTime()
    IndexBuilder.buildFast(spark, corpusDir, indexDir,
      IndexConfig(docsPerShard = 2048, buildPartitions = 64))
    System.err.println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s at $master")
    spark.stop()
  }
}
