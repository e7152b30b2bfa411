package graft.psi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-aware advanced join semantics — the reference's logical join
  * layer re-expressed on Catalyst (spec with worked examples:
  * psi/proto/psi_v2.proto:174-319, enum :357-369).
  *
  * Semantics reproduced:
  *  - inner: a key with n copies on self and m on peer yields n×m rows
  *    (expansion loop analog: psi/utils/table_utils.cc:514-529)
  *  - left/right/full: non-matching rows padded with a configurable null
  *    representation (psi/proto/psi_v2.proto:136-140,
  *    psi/utils/join_processor.cc:305-320)
  *  - difference: full join minus the inner rows
  *    (psi/utils/join_processor.cc:156-167)
  *  - semi / anti: receiver-only output / the except spool
  *    (psi/interface.cc:162-180, psi/utils/table_utils.cc:534-538)
  *
  * Spark's join operators natively implement the n×m duplicate cardinality
  * and all outer flavors; this layer only adds the reference's null-padding,
  * alignment-sort and physical-strategy controls. The reference's four
  * physical joins (partitioned hash / broadcast / dense-map probe /
  * sort-binary-search — SURVEY.md §2.3) map to Spark join hints.
  */
object PsiJoin {

  sealed trait JoinKind { def spark: String }
  case object Inner extends JoinKind { val spark = "inner" }
  case object LeftOuter extends JoinKind { val spark = "left_outer" }
  case object RightOuter extends JoinKind { val spark = "right_outer" }
  case object FullOuter extends JoinKind { val spark = "full_outer" }
  case object LeftSemi extends JoinKind { val spark = "left_semi" }
  case object LeftAnti extends JoinKind { val spark = "left_anti" }
  case object Difference extends JoinKind { val spark = "full_outer" }

  /** Physical strategy selection — the reference hard-codes one per protocol
    * (SURVEY.md §2.3); on Spark they are hints and Catalyst/AQE picks the
    * rest (broadcast for small sides, skew split at runtime).
    */
  sealed trait Strategy { def hint: Option[String] }
  case object Auto extends Strategy { val hint = None }
  case object BroadcastHash extends Strategy { val hint = Some("broadcast") }
  case object ShuffleHash extends Strategy { val hint = Some("shuffle_hash") }
  case object SortMerge extends Strategy { val hint = Some("merge") }

  /** Advanced join on equal-named key columns. Non-key columns from both
    * sides are carried (payload columns, psi_test.cc:392-420). For outer
    * joins, string payload nulls are replaced by `nullRep` and numeric nulls
    * left as SQL NULL (the reference is all-utf8 so it only has the former).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           kind: JoinKind, nullRep: String = "NULL",
           strategy: Strategy = Auto, align: Boolean = false): DataFrame = {
    val r = strategy.hint.map(h => right.hint(h)).getOrElse(right)
    val joined = kind match {
      case Difference =>
        // full join minus inner: keep rows where either side is absent.
        // Probe absence via a side-marker column (keys are equal-named, so
        // null keys cannot distinguish sides after coalescing).
        val lm = left.withColumn("__l", lit(1))
        val rm = r.withColumn("__r", lit(1))
        lm.join(rm, keys, "full_outer")
          .filter(col("__l").isNull || col("__r").isNull)
          .drop("__l", "__r")
      case k => left.join(r, keys, k.spark)
    }
    val stringCols = joined.schema.fields.filter(_.dataType.typeName == "string").map(_.name)
    val padded = if (kind == Inner || kind == LeftSemi || kind == LeftAnti) joined
                 else joined.na.fill(nullRep, stringCols)
    if (align) padded.orderBy(padded.columns.map(col).toIndexedSeq: _*) else padded
  }

  /** The intersection index with peer duplicate counts — the IndexWriter
    * payload `(psi_index, psi_peer_cnt)` (psi/utils/index_store.cc:50-51):
    * for every self row whose key intersects, the number of peer rows minus
    * one carrying that key.
    */
  def intersectIndices(self: DataFrame, peer: DataFrame, keys: Seq[String],
                       rowIdCol: String): DataFrame = {
    val peerCnt = peer.groupBy(keys.map(col): _*)
      .agg((count(lit(1)) - 1).as("psi_peer_cnt"))
    self.join(peerCnt, keys)
      .select(col(rowIdCol).as("psi_index"), col("psi_peer_cnt"))
  }

  /** Result stats — the PsiResultReport analog (psi/proto/psi.proto:154+). */
  case class Report(originalCount: Long, intersectionCount: Long,
                    originalUniqueCount: Long, intersectionUniqueCount: Long)

  def report(self: DataFrame, peer: DataFrame, keys: Seq[String]): Report = {
    val kc = keys.map(col)
    val inter = self.join(peer.select(kc: _*).distinct(), keys, "left_semi")
    Report(
      originalCount = self.count(),
      intersectionCount = inter.count(),
      originalUniqueCount = self.select(kc: _*).distinct().count(),
      intersectionUniqueCount = inter.select(kc: _*).distinct().count())
  }

  /** Duplicate-count expansion: emit each row `1 + dupCnt` times — the
    * ResultDumper expansion (psi/utils/table_utils.cc:473-482) as a
    * generator (`explode(sequence(...))`, SURVEY.md §2.10).
    */
  def expandDups(df: DataFrame, dupCntCol: String): DataFrame =
    df.withColumn("__i", explode(sequence(lit(0), col(dupCntCol).cast("int"))))
      .drop("__i")

  /** Threshold truncation of the unique intersection
    * (intersection_threshold, psi/proto/psi_v2.proto:387-396): cap at the
    * first `threshold` unique keys in key order.
    */
  def thresholdIntersect(self: DataFrame, peer: DataFrame, keys: Seq[String],
                         threshold: Int): DataFrame = {
    val kc = keys.map(col)
    self.select(kc: _*).distinct()
      .join(peer.select(kc: _*).distinct(), keys, "left_semi")
      .orderBy(kc: _*)
      .limit(threshold)
  }
}
