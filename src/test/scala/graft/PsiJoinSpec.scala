package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.psi.PsiJoin
import graft.psi.PsiJoin._

/** Golden-table tests for the advanced-join layer, mirroring the reference's
  * parameterized suite (psi/apps/psi_launcher/psi_test.cc:284-706):
  * duplicate-key n×m expansion, NULL padding, difference, multi-key,
  * unicode keys, identical inputs.
  */
class PsiJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // analog of psi_test.cc:638-706 (inner join with duplicate keys)
  lazy val left = Seq(
    ("k1", "lv1"), ("k1", "lv2"), ("k2", "lv3"), ("k4", "lv4"))
    .toDF("key", "lpayload")
  lazy val right = Seq(
    ("k1", "rv1"), ("k2", "rv2"), ("k2", "rv3"), ("k3", "rv4"))
    .toDF("key", "rpayload")

  test("inner join expands n×m per duplicate key") {
    val got = PsiJoin.join(left, right, Seq("key"), Inner)
    assert(got.count() == 2L * 1 + 1L * 2) // k1: 2×1, k2: 1×2
    val k1 = got.filter($"key" === "k1").collect()
    assert(k1.length == 2 && k1.map(_.getString(2)).forall(_ == "rv1"))
  }

  test("left join pads misses with NULL representation") {
    val got = PsiJoin.join(left, right, Seq("key"), LeftOuter).collect()
    assert(got.length == 5)
    val k4 = got.filter(_.getString(0) == "k4")
    assert(k4.length == 1 && k4.head.getString(2) == "NULL")
  }

  test("full join = inner + left-only + right-only with padding") {
    val got = PsiJoin.join(left, right, Seq("key"), FullOuter, nullRep = "NA")
    assert(got.count() == 4 + 1 + 1)
    val k3 = got.filter($"key" === "k3").collect()
    assert(k3.head.getString(1) == "NA") // left payload padded
  }

  test("difference join keeps only single-side keys") {
    val got = PsiJoin.join(left, right, Seq("key"), Difference).collect()
    assert(got.map(_.getString(0)).sorted.toSeq == Seq("k3", "k4"))
  }

  test("semi/anti joins split the key space") {
    val semi = PsiJoin.join(left, right, Seq("key"), LeftSemi)
    val anti = PsiJoin.join(left, right, Seq("key"), LeftAnti)
    assert(semi.count() + anti.count() == left.count())
    assert(anti.select("key").as[String].collect().toSeq == Seq("k4"))
  }

  test("identical inputs intersect fully (digest short-circuit analog)") {
    val r = PsiJoin.report(left, left, Seq("key"))
    assert(r.intersectionCount == r.originalCount)
    assert(r.intersectionUniqueCount == r.originalUniqueCount)
  }

  test("multi-key composite join (psi_test.cc:450-484)") {
    val l = Seq(("a", "1", "x"), ("a", "2", "y"), ("b", "1", "z")).toDF("k0", "k1", "v")
    val r = Seq(("a", "1", "p"), ("b", "1", "q"), ("b", "2", "r")).toDF("k0", "k1", "w")
    val got = PsiJoin.join(l, r, Seq("k0", "k1"), Inner)
    assert(got.count() == 2)
    assert(got.select("k0", "k1").as[(String, String)].collect().toSet ==
      Set(("a", "1"), ("b", "1")))
  }

  test("unicode keys survive (psi_test.cc:421-449)") {
    val l = Seq(("测试数据", 1), ("中文键", 2), ("emoji🚀", 3)).toDF("key", "v")
    val r = Seq(("测试数据", 10), ("emoji🚀", 30)).toDF("key", "w")
    val got = PsiJoin.join(l, r, Seq("key"), Inner)
    assert(got.count() == 2)
  }

  test("intersectIndices emits (psi_index, psi_peer_cnt)") {
    val self = Seq((0L, "k1"), (1L, "k2"), (2L, "k4")).toDF("rowId", "key")
    val got = PsiJoin.intersectIndices(self, right, Seq("key"), "rowId")
      .orderBy("psi_index").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 0L), (1L, 1L))) // k1: 1 peer copy, k2: 2
  }

  test("expandDups re-inflates duplicate counts") {
    val df = Seq(("a", 0), ("b", 2)).toDF("key", "dup_cnt")
    val got = PsiJoin.expandDups(df, "dup_cnt")
    assert(got.count() == 1 + 3)
  }

  test("thresholdIntersect caps unique keys in key order") {
    val a = (1 to 100).map(i => s"k$i%03d").toDF("key")
    val b = (1 to 100).map(i => s"k$i%03d").toDF("key")
    assert(PsiJoin.thresholdIntersect(a, b, Seq("key"), 10).count() == 10)
  }

  test("physical strategies produce identical results") {
    for (strat <- Seq(BroadcastHash, ShuffleHash, SortMerge)) {
      val got = PsiJoin.join(left, right, Seq("key"), Inner, strategy = strat)
      assert(got.count() == 4, s"strategy $strat")
    }
  }
}
