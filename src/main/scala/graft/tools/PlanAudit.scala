package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CorpusFixture, SparkEntry}

/** Prints `explain(formatted)` for the plans whose physical shape matters at
  * scale, so pushdown/broadcast/codegen can be audited (SURVEY.md §4).
  * Usage: runMain graft.tools.PlanAudit <sfDir> [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = if (args.length > 1) args.drop(1).toSet
                else Set("q_scan_project", "q_membership_filter", "q1_agg",
                  "q_join_inner_dup", "q_topk", "q_window_rank")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if which(name)) {
      println(s"\n========== $name ==========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"(failed: ${e.getMessage.take(200)})") }
    }
    // the query-side posting scan: term IN (...) must reach the parquet scan
    if (which("bm25_scan") || args.length <= 1) {
      CorpusFixture.ensure(spark)
      println("\n========== bm25 postings scan (term pushdown) ==========")
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"${CorpusFixture.indexDir}/postings.parquet")
        .filter(col("term").isin("import", "def", "util_7"))
        .explain("formatted")
    }
    spark.stop()
  }
}
