package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusSource

/** Corpus-source abstraction (Iceberg-ready format plumbing over the
  * parquet sandbox) + live progress reporting.
  */
class SourceProgressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet corpus source reads and validates the input_hint schema") {
    val (corpusDir, _) = TestSpark.builtIndex
    val df = CorpusSource.readFiles(spark, corpusDir)
    assert(CorpusSource.Columns.forall(df.columns.contains))
    assert(df.count() > 0)
    assert(CorpusSource.readRefSha(spark, corpusDir).columns
      .contains("ref_sha256"))
  }

  test("schema validation rejects a table missing input_hint columns") {
    import spark.implicits._
    val dir = s"${TestSpark.workDir}/bad_schema_corpus"
    Seq(("r", "p")).toDF("repo", "path")
      .write.mode("overwrite").parquet(s"$dir/files.parquet")
    val e = intercept[IllegalArgumentException] {
      CorpusSource.readFiles(spark, dir)
    }
    assert(e.getMessage.contains("commit"))
  }

  test("iceberg snapshot pinning options are exclusive and well-formed") {
    assert(CorpusSource.icebergReadOptions(None, None).isEmpty)
    assert(CorpusSource.icebergReadOptions(Some(42L), None) ==
      Map("snapshot-id" -> "42"))
    assert(CorpusSource.icebergReadOptions(None, Some(1700000000000L)) ==
      Map("as-of-timestamp" -> "1700000000000"))
    intercept[IllegalArgumentException] {
      CorpusSource.icebergReadOptions(Some(1L), Some(2L))
    }
  }

  test("unknown format is a clear error; conf selects the format") {
    spark.conf.set("spark.graft.source.format", "orc9000")
    try {
      val e = intercept[RuntimeException] {
        CorpusSource.readFiles(spark, "/nowhere")
      }
      assert(e.getMessage.contains("orc9000"))
    } finally spark.conf.unset("spark.graft.source.format")
    assert(CorpusSource.format(spark) == "parquet")
  }

  test("progress reporter observes stages/tasks/records of a real job") {
    import spark.implicits._
    val r = ProgressReporter.attach(spark, "spec", intervalMs = 0)
    try {
      spark.range(100000).select(($"id" * 2).as("x")).agg(Map("x" -> "sum")).head()
    } finally {
      val s = ProgressReporter.detach(spark, r)
      assert(s.tasksCompleted > 0 && s.stagesCompleted > 0)
      assert(s.elapsedSec > 0)
    }
  }
}
