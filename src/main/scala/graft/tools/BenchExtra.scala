package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher
import graft.SparkEntry

/** Iteration bench for the optimization rounds — NOT the driver's frozen
  * `graft.Bench` harness (which it leaves untouched): same corpus, same
  * build configs, same query set and the same collect()-timed methodology,
  * but with
  *   - a section filter (`build`, `queries`, `pos`, `table`) so one change
  *     can be re-measured without paying the full sweep,
  *   - N repetitions per query printing min (noise only inflates — the min
  *     is the honest point estimate on this noisy host),
  *   - no scaling phase.
  *
  * Usage: sbt "runMain graft.tools.BenchExtra [sections] [reps] [only-substr]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_DOCS as in
  * Bench.
  */
object BenchExtra {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sections = args.headOption.getOrElse("build,queries,pos,table")
      .split(",").map(_.trim).toSet
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).getOrElse("")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong)
      .getOrElse(15000L * math.max(cpus, 4))

    val shm = java.nio.file.Paths.get("/dev/shm")
    val work = (if (Files.isDirectory(shm) && Files.isWritable(shm))
      Files.createTempDirectory(shm, "psispark-benchx")
    else Files.createTempDirectory("psispark-benchx")).toString

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"psispark-benchx-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$work/sparklocal")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def record(name: String, reps0: Int = reps)(body: => Unit): Unit = {
      if (only.nonEmpty && !name.contains(only)) return
      spark.sparkContext.setJobDescription(s"benchx:$name")
      body // warm
      val xs = (1 to reps0).map(_ => timed(body)._2).toVector
      results(name) = xs
      println(f"BENCHX $name%-28s min=${xs.min}%.3f med=${xs.sorted.apply((xs.size - 1) / 2)}%.3f reps=${xs.mkString("[", ",", "]")}")
      spark.sparkContext.setJobDescription(null)
    }

    try {
      val corpusDir = s"$work/corpus"
      val buildParts = 64
      val needCorpus = sections.exists(Set("build", "queries", "pos"))
      if (needCorpus) {
        val (_, tGen) = timed(CorpusGen.writeCorpus(spark,
          CorpusGen.Config(numDocs = benchDocs), corpusDir))
        println(f"BENCHX corpus_gen min=$tGen%.3f")
        // warm small build (JIT/codegen) as Bench does
        CorpusGen.writeCorpus(spark, CorpusGen.Config(numDocs = 2000), s"$work/warmcorpus")
        IndexBuilder.buildFast(spark, s"$work/warmcorpus", s"$work/warmindex",
          IndexConfig(docsPerShard = 2048, buildPartitions = buildParts))
      }

      if (sections("build")) {
        (1 to math.max(1, reps - 1)).foreach { i =>
          graft.FsUtil.deleteRecursively(s"$work/index_b$i")
          val (_, tF) = timed(IndexBuilder.buildFast(spark, corpusDir,
            s"$work/index_b$i",
            IndexConfig(docsPerShard = 2048, buildPartitions = buildParts)))
          println(f"BENCHX index_build_fast rep$i min=$tF%.3f")
          graft.FsUtil.deleteRecursively(s"$work/index_b$i")
        }
        (1 to math.max(1, reps - 1)).foreach { i =>
          graft.FsUtil.deleteRecursively(s"$work/indexpos_b$i")
          val (_, tP) = timed(IndexBuilder.buildFast(spark, corpusDir,
            s"$work/indexpos_b$i",
            IndexConfig(docsPerShard = 2048, buildPartitions = buildParts,
              positions = true)))
          println(f"BENCHX index_build_positional rep$i min=$tP%.3f")
          graft.FsUtil.deleteRecursively(s"$work/indexpos_b$i")
        }
      }

      if (sections("queries")) {
        IndexBuilder.buildFast(spark, corpusDir, s"$work/index",
          IndexConfig(docsPerShard = 2048, buildPartitions = buildParts))
        val searcher = new Searcher(spark, s"$work/index")
        val qset = CorpusGen.referenceQuerySet(CorpusGen.Config(numDocs = benchDocs))
        record("bm25_qset_all") {
          qset.foreach { case (_, q, k) => searcher.search(q, k).collect() }
        }
        record("bm25_batch_qset") { searcher.searchBatch(qset).count() }
        record("bm25_or_all") {
          Seq("import def util_7", "import val class", "def return if",
            "val import zzqx_nothing", "class import def val")
            .foreach(q => searcher.searchOr(q, 10).collect())
        }
        record("bm25_filtered_all") {
          Seq(col("lang") === "scala", col("lang") === "py",
            col("repo") < "repo-0010", col("lang") === "go",
            col("repo") >= "repo-0030")
            .foreach(p => searcher.searchWhere("import val", 10, p).collect())
        }
        record("bm25_prefix_all") {
          Seq("util_1", "util_2", "util_3", "util_4", "sym_0")
            .foreach(p => searcher.searchPrefix(p, 10).collect())
        }
        record("bm25_regex_all") {
          Seq("util_1[0-9]", "[uv]til_2[0-9]", "sym_0[0-9a-f]+")
            .foreach(p => searcher.searchRegex(p, 10).collect())
        }
        record("bm25_bool_all") {
          Seq("(util_7 def) OR (util_3 val)", "util_7 (def OR -val)",
            "import -(util_7 util_3)", "(util_1 OR util_2) def class")
            .foreach(q => searcher.searchBool(q, 10).collect())
        }
        record("bm25_msm_all") {
          Seq("MSM 2 (util_7 def util_3)",
            "MSM 2 (util_1 util_2 util_3 util_7)",
            "MSM 3 (import def val class)")
            .foreach(q => searcher.searchBool(q, 10).collect())
        }
        record("bm25_trange_all") {
          Seq((Some("util_10"), Some("util_13")), (Some("util_1"), Some("util_4")),
            (Some("zz"), None: Option[String]))
            .foreach { case (lo, hi) => searcher.searchTermRange(lo, hi, 10).collect() }
        }
        record("bm25_collapse") {
          searcher.searchCollapse("import util_7", 10, "lang").collect()
        }
        record("bm25_sortby") {
          searcher.searchSortBy("import util_7", 10, "path").collect()
        }
        record("bm25_syn_all") {
          Seq(Seq("util_7", "util_17"), Seq("import", "def"),
            Seq("util_1", "util_2", "util_3"))
            .foreach(v => searcher.searchSynonym(v, 10).collect())
        }
        record("bm25_fuzzy_all") {
          Seq("util_7", "util_42", "import")
            .foreach(q => searcher.searchFuzzy(q, 10, 1).collect())
        }
        record("bm25_mlt") {
          val corpus = spark.read.parquet(s"$corpusDir/files.parquet")
          searcher.moreLikeThis(corpus, 42L, 10).collect()
        }
        record("bm25_wildcard_all") {
          Seq("util_4?", "ut?l_12*", "import*")
            .foreach(q => searcher.searchWildcard(q, 10).collect())
        }
        record("bm25_dismax_all") {
          Seq("DISMAX (util_7 import)",
            "DISMAX 0.3 (util_7 (def val) class^1.5)",
            "DISMAX 0.5 ((import def) (val class))")
            .foreach(q => searcher.searchBool(q, 10).collect())
        }
        record("facet_counts") {
          searcher.searchFacets("import def util_7", "lang").collect()
        }
        record("facet_ranges") {
          searcher.searchFacetRanges("import def", "dlen",
            Seq(250.0, 300.0, 350.0)).collect()
        }
        record("facet_stats") {
          searcher.searchFacetStats("import def", "dlen").collect()
        }
        record("sigterms") {
          searcher.significantTerms("import util_7", 15).collect()
        }
        record("bm25_bool_multiterm_all") {
          Seq("util_1* OR def", "util_7~1 AND def")
            .foreach(q => searcher.searchBool(q, 10).collect())
        }
      }

      if (sections("pos")) {
        IndexBuilder.buildFast(spark, corpusDir, s"$work/indexpos",
          IndexConfig(docsPerShard = 2048, buildPartitions = buildParts,
            positions = true))
        val ps = new Searcher(spark, s"$work/indexpos")
        val phrases = Seq("import def", "def class", "import def class",
          "val import", "class extends")
        record("bm25_phrase_all") {
          phrases.foreach(p => ps.searchPhrase(p, 10).collect())
        }
        record("bm25_spanfirst_all") {
          phrases.foreach(p => ps.searchSpanFirst(p, 10, 16).collect())
        }
        record("bm25_mphrase_all") {
          Seq(Seq(Seq("import"), Seq("def", "class")),
            Seq(Seq("def", "val"), Seq("class")),
            Seq(Seq("import"), Seq("def"), Seq("class", "val")))
            .foreach(sl => ps.searchMultiPhrase(sl, 10).collect())
        }
        record("bm25_spannot_all") {
          Seq(("import def", "class"), ("def class", "val"))
            .foreach { case (p, x) => ps.searchSpanNot(p, x, 10, 1, 1).collect() }
        }
        record("bm25_pphrase_all") {
          Seq("import util_1", "def util_3", "import def")
            .foreach(p => ps.searchPhrasePrefix(p, 10).collect())
        }
        record("bm25_near_all") {
          Seq(("import util_7", 6), ("import def util_7", 10),
            ("def class val", 12), ("import util_3", 4), ("val util_7", 8))
            .foreach { case (q, w) => ps.searchNear(q, 10, w).collect() }
        }
        record("bm25_bool_phrase_all") {
          Seq("\"import def\" OR util_7", "(\"import def\" OR util_3) val",
            "\"import def\" -util_7")
            .foreach(q => ps.searchBool(q, 10).collect())
        }
        record("bm25_near_ordered_all") {
          Seq(("import util_7", 6), ("import def util_7", 10),
            ("def class val", 12), ("import util_3", 4), ("val util_7", 8))
            .foreach { case (q, w) => ps.searchNear(q, 10, w, ordered = true).collect() }
        }
      }

      if (sections("table")) {
        val qmap = SparkEntry.queries
        val headline = Seq(
          "q_scan_project", "q1_agg", "q_keyinfo", "q_membership_filter",
          "q_join_inner_dup", "q_join_left_pad", "q_psi_indices",
          "q_set_intersect", "q_multiparty_intersect", "q_multikey_sort",
          "q_topk", "q_window_rank", "q_rolling_digest",
          "q_token_counts", "q_text_quality", "q_fingerprint", "q_lang_id",
          "q_multimodal_stub", "q_multimodal_real", "q_ann_topk", "q_ann_ivf",
          "q_sessionize", "q_stream_window", "q_stream_window_append",
          "q_stream_users_append")
        for (name <- headline if qmap.contains(name)) {
          record(name) { qmap(name)(spark, sfDir).count() }
        }
      }

      val total = results.map(_._2.min).sum
      println(f"BENCHX_TOTAL (sum of mins over measured sections) $total%.3f sec")
    } finally {
      spark.stop()
      graft.FsUtil.deleteRecursively(work)
    }
  }
}
