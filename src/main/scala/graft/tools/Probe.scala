package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.Tokenize

/** Micro-bisection of the tokenize/tf pipeline cost. */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(corpusDir, cpus) = args
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("PROBE_MAX_PART_BYTES", s"${128 * 1024 * 1024}"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val files = spark.read.parquet(s"$corpusDir/files.parquet")
    System.err.println(s"[probe] scan partitions = ${files.rdd.getNumPartitions}")
    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($r)")
    }
    time("warm/count")(files.count())
    time("read+count")(files.count())
    time("sha2")(files.select(sha2(col("content"), 256).as("s"))
      .agg(max(length(col("s")))).head())
    time("split-size")(files.select(
      size(split(lower(col("content")), "[^a-z0-9_]+")).as("n"))
      .agg(sum(col("n"))).head())
    time("tokenize-explode-count")(files.select(
      explode(Tokenize.termsCol(col("content"))).as("term")).count())
    time("tf-agg")(files.select(col("path"),
      explode(Tokenize.termsCol(col("content"))).as("term"))
      .groupBy("term", "path").agg(count(lit(1))).count())

    import spark.implicits._
    val mem = files.select(col("content")).as[String].collect()
    time("driver-pure-split") {
      var tok = 0L
      var i = 0
      while (i < mem.length) {
        tok += mem(i).toLowerCase.split("[^a-z0-9_]+").count(_.nonEmpty)
        i += 1
      }
      tok
    }
    time("driver-pure-split-2") {
      var tok = 0L
      var i = 0
      while (i < mem.length) {
        tok += mem(i).toLowerCase.split("[^a-z0-9_]+").count(_.nonEmpty)
        i += 1
      }
      tok
    }
    val memDs = spark.createDataset(mem).repartition(cpus.toInt)
    time("mem-split-size")(memDs.select(
      size(split(lower(col("value")), "[^a-z0-9_]+")).as("n"))
      .agg(sum(col("n"))).head())
    time("typed-split-count")(memDs.mapPartitions { it =>
      it.map(s => s.toLowerCase.split("[^a-z0-9_]+").count(_.nonEmpty).toLong)
    }.reduce(_ + _))
    // sample executor stacks while the typed split runs
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampler = new Thread(() => {
      while (sampling.get()) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val key = st.take(3).mkString(" <- ")
            hist.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    time("typed-split-files")(files.select(col("content")).as[String]
      .mapPartitions { it =>
        it.map(s => s.toLowerCase.split("[^a-z0-9_]+").count(_.nonEmpty).toLong)
      }.reduce(_ + _))
    sampling.set(false)
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (k, n) =>
      System.err.println(f"[hot] $n%5d  $k")
    }
    time("regexp_extract_all")(files.select(
      size(regexp_extract_all(lower(col("content")), lit("[a-z0-9_]+"), lit(0))).as("n"))
      .agg(sum(col("n"))).head())
    spark.stop()
  }
}
