package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.index.Codec

/** Property tests for the posting codec — decode(encode(xs)) == xs for any
  * sorted longs (SURVEY.md §5: "the codec is the one place property-based
  * testing beats examples"). ScalaCheck is driven directly (the
  * scalatest-plus bridge is not in the offline cache).
  */
class CodecSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 1L << 50)).map(_.distinct.sorted.toArray)

  test("delta+varbyte roundtrip on sorted longs") {
    check(Prop.forAll(sortedLongs) { xs =>
      Codec.decodeDeltas(Codec.encodeDeltas(xs), xs.length).sameElements(xs)
    })
  }

  test("varbyte roundtrip on non-negative ints") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0, Int.MaxValue))) { l =>
      val xs = l.toArray
      Codec.decodeInts(Codec.encodeInts(xs), xs.length).sameElements(xs)
    })
  }

  test("encoding is compact: small gaps take one byte") {
    val xs = Array.tabulate(1000)(i => 100L + i)
    val enc = Codec.encodeDeltas(xs)
    assert(enc.length <= 1001, s"got ${enc.length} bytes for 1000 dense postings")
  }

  test("block meta: admissible upper bound and block firsts") {
    val docs = Array.tabulate(300)(i => i.toLong * 3)
    val tfs = Array.tabulate(300)(i => 1 + (i % 7))
    val dlens = Array.tabulate(300)(i => 50 + (i % 100))
    val (firsts, maxes, maxTfs, minDls) =
      Codec.blockMeta(docs, tfs, dlens, 1.2, 0.75, 77.7)
    assert(firsts.length == 3 && maxes.length == 3)
    assert(firsts(0) == 0 && firsts(1) == docs(128) && firsts(2) == docs(256))
    var i = 0
    while (i < 300) {
      val tf = tfs(i).toDouble
      val norm = tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlens(i) / 77.7))
      assert(maxes(i / 128).toDouble >= norm, s"bound not admissible at $i")
      assert(maxTfs(i / 128) >= tfs(i) && minDls(i / 128) <= dlens(i))
      i += 1
    }
    // avgdl-free recompute: admissible under a DIFFERENT corpus avgdl
    for (avgdl2 <- Seq(30.0, 77.7, 200.0)) {
      val re = Codec.recomputeBlockUb(maxTfs, minDls, 1.2, 0.75, avgdl2)
      i = 0
      while (i < 300) {
        val tf = tfs(i).toDouble
        val norm = tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlens(i) / avgdl2))
        assert(re(i / 128).toDouble >= norm,
          s"recomputed bound not admissible at $i under avgdl=$avgdl2")
        i += 1
      }
    }
  }

  test("native vbyte_decode expressions roundtrip through SQL + codegen") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.functions.VByteFunctions.register(spark)
    val docs = Array(3L, 17L, 1000L, 1001L, 123456789L)
    val tfs = Array(1, 7, 2, 300, 42)
    val df = Seq((Codec.encodeDeltas(docs), Codec.encodeInts(tfs), docs.length))
      .toDF("docBytes", "tfBytes", "n")
    val row = df.selectExpr("vbyte_decode_deltas(docBytes, n) AS d",
      "vbyte_decode_ints(tfBytes, n) AS f").head()
    assert(row.getSeq[Long](0) == docs.toSeq)
    assert(row.getSeq[Int](1) == tfs.toSeq)
    // codegen plan (not fallback): over a real scan (a local relation would
    // constant-fold to LocalTableScan) the projection stays in codegen
    val p = s"${TestSpark.workDir}/vbyte_codegen_probe"
    df.write.mode("overwrite").parquet(p)
    val scanned = spark.read.parquet(p)
      .selectExpr("vbyte_decode_deltas(docBytes, n) AS d")
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val planStr = scanned.queryExecution.executedPlan.toString
    assert(planStr.contains("*(1) Project [vbyte_decode_deltas"), planStr)
    assert(scanned.head().getSeq[Long](0) == docs.toSeq)
  }

  test("graft expressions reject mistyped inputs at analysis time") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.functions.VByteFunctions.register(spark)
    val df = Seq((1, 2)).toDF("a", "n")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("token_count(a)").head()
    }
    assert(e1.getMessage.contains("token_count"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("vbyte_decode_deltas(a, n)").head()
    }
    assert(e2.getMessage.contains("vbyte_decode_deltas"))
  }

  test("gallop finds first index >= target") {
    val arr = Array(1L, 3L, 3L, 7L, 10L, 50L)
    import graft.query.Searcher.gallop
    assert(gallop(arr, 0, 0L) == 0)
    assert(gallop(arr, 0, 3L) == 1)
    assert(gallop(arr, 2, 3L) == 2)
    assert(gallop(arr, 0, 8L) == 4)
    assert(gallop(arr, 0, 51L) == 6)
    assert(gallop(arr, 5, 50L) == 5)
  }
}
