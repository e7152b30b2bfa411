package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Benchmark main — the throughput/latency feedback loop (BASELINE.md).
  *
  * Reports, as one JSON line:
  *  - headline table-operator timings at SPARK_GRAFT_SF_DIR
  *  - index-build throughput (files/sec, postings/sec) on the deterministic
  *    bench corpus (fast-path build)
  *  - BM25 reference-query-set latency (p50/p95 of warmed runs)
  *  - N vs 4N scaling: the identical build at local[cpus/4] vs local[cpus]
  *    on the same input, with throughput-scaling efficiency — the sandbox
  *    evidence for the north rule's two-cluster-size criterion.
  */
object Bench {

  /** Bench corpus size scales with the CPU budget (15k docs/core, i.e. 480k
    * at 32 cpus) so total bench wall-time stays bounded when the driver runs
    * with fewer cores; override with SPARK_GRAFT_BENCH_DOCS.
    */
  private def benchDocs(cpus: Int): Long =
    sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong)
      .getOrElse(15000L * math.max(cpus, 4))

  /** Table queries safe at sf0.1 (excludes the intentionally-quadratic
    * oracle-path ops like brute-force all-pairs near-dup).
    */
  private val headline = Seq(
    "q_scan_project", "q1_agg", "q_keyinfo", "q_membership_filter",
    "q_join_inner_dup", "q_join_left_pad", "q_psi_indices",
    "q_set_intersect", "q_multiparty_intersect", "q_multikey_sort",
    "q_topk", "q_window_rank", "q_rolling_digest",
    "q_token_counts", "q_text_quality", "q_fingerprint", "q_lang_id",
    "q_multimodal_stub", "q_ann_topk", "q_ann_ivf", "q_sessionize",
    "q_stream_window")

  /** Bench working dir: tmpfs when available. A single shared spinning/virt
    * disk is a sandbox artifact — on a real cluster every added executor
    * brings its own local disks, so IO bandwidth scales WITH cluster size;
    * tmpfs (RAM-backed, 128 GiB box, ~4 GiB peak usage) models that.
    * Deleted on exit.
    */
  private def mkWorkDir(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = if (Files.isDirectory(shm) && Files.isWritable(shm))
      Files.createTempDirectory(shm, "psispark-bench")
    else Files.createTempDirectory("psispark-bench")
    base.toString
  }

  private def deleteRecursively(dir: String): Unit =
    FsUtil.deleteRecursively(dir)

  private def session(cpus: Int, localDir: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"psispark-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val lowCpus = math.max(2, cpus / 4)
    val BenchDocs = benchDocs(cpus)
    val work = mkWorkDir()
    try runBench(work, sfDir, cpus, lowCpus, BenchDocs)
    finally deleteRecursively(work) // tmpfs (RAM)-backed — free it even on failure
  }

  private def runBench(work: String, sfDir: String, cpus: Int, lowCpus: Int,
                       BenchDocs: Long): Unit = {
    val corpusDir = s"$work/corpus"
    val buildParts = 64

    // ---- phase 0: warmup — generate corpora and run a small build so that
    // JVM-wide one-time costs (whole-stage codegen compilation, JIT) are paid
    // before EITHER timed run; otherwise the first run unfairly absorbs them
    val warm = session(cpus, s"$work/sparklocal")
    CorpusGen.writeCorpus(warm, CorpusGen.Config(numDocs = BenchDocs), corpusDir)
    CorpusGen.writeCorpus(warm, CorpusGen.Config(numDocs = 2000), s"$work/warmcorpus")
    IndexBuilder.buildFast(warm, s"$work/warmcorpus", s"$work/warmindex",
      IndexConfig(docsPerShard = 2048, buildPartitions = buildParts))
    warm.stop()

    // ---- phase 1: N and 4N builds at two operating points ----------------
    // 2→8 cores: compute-bound regime (the honest N→4N proxy for adding
    // nodes, which adds memory bandwidth). 8→32 cores: the single-JVM
    // memory-bandwidth wall — reported too, because it is the regime the
    // reference itself shows as flat (psi_v2_benchmark.md: RR22 times are
    // ~equal at 8C/16C/32C).
    // Every level runs in its OWN forked JVM (graft.tools.ScaleRun, spawned
    // with this JVM's exact args + classpath) = the spark-submit analog:
    // no shared heap, no cross-run GC debt, in-JVM warmup build first.
    // partition count is a function of DATA SIZE, identical at every
    // parallelism level (cores only control concurrency) — the same policy a
    // 100 TB deployment uses (numPartitions from volume, executors from
    // cluster size; reference analog: bucket_count = ceil(n/bucket_size),
    // psi/utils/bucket.cc:141-168)
    def buildAt(n: Int): Double = {
      import scala.jdk.CollectionConverters._
      import scala.sys.process._
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++ jvmArgs ++
        Seq("-cp", System.getProperty("java.class.path"),
          s"-Dspark.local.dir=$work/sparklocal_$n",
          "graft.tools.ScaleRun", corpusDir, s"$work/warmcorpus",
          s"$work/index_$n", n.toString)
      val out = new StringBuilder
      val ec = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
      require(ec == 0, s"ScaleRun at $n cores failed (exit $ec)")
      "SCALE_RESULT ([0-9.]+)".r.findFirstMatchIn(out.toString)
        .map(_.group(1).toDouble)
        .getOrElse(sys.error(s"no SCALE_RESULT from ScaleRun at $n cores"))
    }
    // The sandbox host is noisy (identical runs vary up to 3x minute to
    // minute, see BASELINE.md): measure each level SPARK_GRAFT_SCALE_REPS
    // times minimum (default 2), interleaved across levels so noise windows
    // spread evenly, and take the per-level minimum — the standard
    // noise-robust wall-clock estimator. Reps AUTO-ESCALATE (cap
    // SPARK_GRAFT_SCALE_MAX_REPS, default 5) while the evidence is
    // noise-suspect: per-level spread > 20%, or throughput NON-monotonic in
    // cores (more cores measurably slower = the host stole a window — r01
    // recorded t(8cores) > t(2cores) on a 480k-doc build, a physical
    // impossibility for this embarrassingly-parallel job). Every raw rep is
    // emitted in the scaling JSON so a noisy window is self-explaining.
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX_REPS", "5").toInt
    val levels = Seq(2, lowCpus, cpus).distinct
    val raw = scala.collection.mutable.LinkedHashMap[Int, Vector[Double]]()
    def runRep(): Unit = levels.foreach { n =>
      raw(n) = raw.getOrElse(n, Vector.empty) :+ buildAt(n)
    }
    def best(n: Int): Double = raw(n).min
    def spreadTooHigh: Boolean = levels.exists { n =>
      val xs = raw(n); (xs.max - xs.min) / xs.min > 0.20
    }
    // escalate only on the compute-bound 2→lowCpus pair and with a 5%
    // tolerance: the lowCpus→cpus pair sits on the documented single-box
    // memory-bandwidth wall where flat (±noise) is the EXPECTED shape, and a
    // strict > there would push every run to the rep cap for no new evidence
    def nonMonotonic: Boolean =
      levels.take(2) match {
        case Seq(a, b) => best(b) > best(a) * 1.05
        case _ => false
      }
    (1 to reps).foreach(_ => runRep())
    while (raw(levels.head).size < maxReps && (spreadTooHigh || nonMonotonic))
      runRep()
    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted; s((s.size - 1) / 2)
    }
    val tN2 = best(2)
    val tLow = best(lowCpus)
    val tHighFork = best(cpus)

    // ---- phase 2: full-parallelism build + queries ------------------------
    val spark = session(cpus, s"$work/sparklocal")
    val (meta, tHigh) = timed {
      IndexBuilder.buildFast(spark, corpusDir, s"$work/index",
        IndexConfig(docsPerShard = 2048, buildPartitions = buildParts))
    }
    val thrN2 = BenchDocs / tN2
    val thrLow = BenchDocs / tLow
    val thrHigh = BenchDocs / tHighFork
    val eff28 = (thrLow / thrN2) / (lowCpus / 2.0)
    val efficiency = (thrHigh / thrLow) / (cpus.toDouble / lowCpus)

    // BM25 reference query set: warm once, then measure
    val searcher = new Searcher(spark, s"$work/index")
    val qset = CorpusGen.referenceQuerySet(CorpusGen.Config(numDocs = BenchDocs))
    qset.foreach { case (_, q, k) => searcher.search(q, k).collect() }
    val latencies = qset.map { case (_, q, k) =>
      timed(searcher.search(q, k).collect())._2
    }.sorted
    def pct(xs: Seq[Double], p: Double) =
      xs(math.min(xs.size - 1, (p * xs.size).toInt))
    val qsecs = scala.collection.mutable.LinkedHashMap[String, Double]()
    qsecs("index_build_fast") = tHigh
    qsecs("bm25_qset_p50") = pct(latencies, 0.50)
    qsecs("bm25_qset_p95") = pct(latencies, 0.95)
    // whole query set as ONE Spark job (the throughput mode)
    qsecs("bm25_batch_qset") = timed(searcher.searchBatch(qset).count())._2

    // hot-term disjunctive (OR) queries — the WAND-pruned document-at-a-time
    // path; hot lists are walked in pivot jumps, not posting by posting
    {
      val orQs = Seq("import def util_7", "import val class", "def return if",
        "val import zzqx_nothing", "class import def val")
      orQs.foreach(q => searcher.searchOr(q, 10).collect())
      val lat = orQs.map(q => timed(searcher.searchOr(q, 10).collect())._2).sorted
      qsecs("bm25_or_p50") = pct(lat, 0.50)
      qsecs("bm25_or_p95") = pct(lat, 0.95)
    }

    // metadata-filtered search (zero-idf filter list in the intersection)
    {
      import org.apache.spark.sql.functions.col
      val preds = Seq(col("lang") === "scala", col("lang") === "py",
        col("repo") < "repo-0010", col("lang") === "go",
        col("repo") >= "repo-0030")
      preds.foreach(p => searcher.searchWhere("import val", 10, p).collect())
      val lat = preds.map(p =>
        timed(searcher.searchWhere("import val", 10, p).collect())._2).sorted
      qsecs("bm25_filtered_p50") = pct(lat, 0.50)
      qsecs("bm25_filtered_p95") = pct(lat, 0.95)
    }

    // positional index: build-time overhead of storing positions, then
    // exact-phrase latency over it
    val (_, tPos) = timed {
      IndexBuilder.buildFast(spark, corpusDir, s"$work/indexpos",
        IndexConfig(docsPerShard = 2048, buildPartitions = buildParts,
          positions = true))
    }
    qsecs("index_build_positional") = tPos
    val phraseSearcher = new Searcher(spark, s"$work/indexpos")
    val phrases = Seq("import def", "def class", "import def class",
      "val import", "class extends")
    phrases.foreach(p => phraseSearcher.searchPhrase(p, 10).collect())
    val phraseLat = phrases.map(p =>
      timed(phraseSearcher.searchPhrase(p, 10).collect())._2).sorted
    qsecs("bm25_phrase_p50") = pct(phraseLat, 0.50)
    qsecs("bm25_phrase_p95") = pct(phraseLat, 0.95)

    // headline table operators at sfDir
    val qmap = SparkEntry.queries
    for (name <- headline if qmap.contains(name)) {
      val sec = try timed(qmap(name)(spark, sfDir).count())._2
                catch { case _: Throwable => -1.0 }
      qsecs(name) = sec
    }

    val total = qsecs.values.filter(_ >= 0).sum
    val qs = qsecs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    // median-based efficiencies ride along so a lucky/unlucky min is visible
    val effMed28 = ((BenchDocs / median(raw(lowCpus))) / (BenchDocs / median(raw(2)))) / (lowCpus / 2.0)
    val effMedHigh = ((BenchDocs / median(raw(cpus))) / (BenchDocs / median(raw(lowCpus)))) / (cpus.toDouble / lowCpus)
    // PAIRED estimator: reps are interleaved across levels, so rep i's runs
    // at both levels sit in the same host-noise window — the per-rep ratio
    // cancels the window, and the median of those ratios is robust to both
    // a lucky min on one side and a slow outlier rep (standard paired-ratio
    // treatment for noisy-host scaling measurements)
    def effPaired(lo: Int, hi: Int): Double = median(
      raw(lo).zip(raw(hi)).map { case (tl, th) => (tl / th) / (hi.toDouble / lo) }.toVector)
    val effPair28 = effPaired(2, lowCpus)
    val effPairHigh = effPaired(lowCpus, cpus)
    val rawJson = raw.map { case (n, xs) =>
      s""""$n":${xs.map(x => f"$x%.2f").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val scaling =
      f"""{"cores2Sec":$tN2%.2f,"lowCpus":$lowCpus,"highCpus":$cpus,""" +
        f""""buildSecLow":$tLow%.2f,"buildSecHigh":$tHighFork%.2f,""" +
        f""""filesPerSec2":$thrN2%.1f,"filesPerSecLow":$thrLow%.1f,""" +
        f""""filesPerSecHigh":$thrHigh%.1f,""" +
        f""""eff_2_to_$lowCpus":$eff28%.3f,"eff_${lowCpus}_to_$cpus":$efficiency%.3f,""" +
        f""""eff_median_2_to_$lowCpus":$effMed28%.3f,""" +
        f""""eff_median_${lowCpus}_to_$cpus":$effMedHigh%.3f,""" +
        f""""eff_paired_2_to_$lowCpus":$effPair28%.3f,""" +
        f""""eff_paired_${lowCpus}_to_$cpus":$effPairHigh%.3f,""" +
        s""""repsPerLevel":${raw(levels.head).size},"rawSecByCores":$rawJson,""" +
        s""""estimator":"per-level min + per-level median + paired per-rep ratio median, over interleaved forked-JVM reps; reps auto-escalate (cap $maxReps) on >20% spread or non-monotonic throughput"}"""
    val idx =
      f"""{"docs":${meta.numDocs},"postings":${meta.totalTokens},""" +
        f""""filesPerSec":${BenchDocs / tHigh}%.1f,"postingsPerSec":${meta.totalTokens / tHigh}%.0f,""" +
        f""""terms":${meta.numTerms},"segments":${meta.numSegments}}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","index_build":$idx,"scaling":$scaling}"""
    // print FIRST (the driver scrapes stdout too) so a failed file write can
    // never lose the measurements, then persist the artifact of record: a
    // bare one-line JSON in the working directory (sbt forks in the repo
    // root) the driver can read without scraping sbt [info]-prefixed stdout
    // (r01 BENCH parsed: null)
    println(json)
    try Files.write(
      java.nio.file.Paths.get(sys.props("user.dir")).resolve("BENCH.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] BENCH.json write failed: ${e.getMessage}") }
    spark.stop()
  }
}
