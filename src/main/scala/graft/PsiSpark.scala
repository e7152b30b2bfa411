package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.{IndexBuilder, IndexConfig, IndexMeta}
import graft.psi.PsiJoin
import graft.query.Searcher

/** Embedded API facade — the analog of the reference's `api::PsiExecute`
  * (psi/apps/psi_launcher/launch.h:56-77): one entry point a user of the
  * reference can switch to, next to the spark-submit `graft.Main`.
  *
  * {{{
  * val handle = PsiSpark.buildIndex(spark, corpusDir, indexDir)
  * handle.query("import def util_7", k = 10)            // AND top-k
  * handle.queryOr("import zzz", k = 10)                 // OR top-k
  * handle.queryBatch(Seq(("q1", "import val", 10)))     // one job, many queries
  *
  * PsiSpark.psiExecute(left, right, Seq("key"), PsiJoin.Inner)
  * }}}
  */
object PsiSpark {

  /** Staged, resumable build (the petabyte default). */
  def buildIndex(spark: SparkSession, corpusDir: String, indexDir: String,
                 cfg: IndexConfig = IndexConfig()): IndexHandle = {
    IndexBuilder.build(spark, corpusDir, indexDir, cfg)
    openIndex(spark, indexDir)
  }

  /** Fused fast-path build (throughput mode; per-artifact resumable since
    * r2 — a kill mid-build restarts from the last committed artifact).
    */
  def buildIndexFast(spark: SparkSession, corpusDir: String, indexDir: String,
                     cfg: IndexConfig = IndexConfig()): IndexHandle = {
    IndexBuilder.buildFast(spark, corpusDir, indexDir, cfg)
    openIndex(spark, indexDir)
  }

  /** Open a previously-built index, optionally with streaming deltas and a
    * tombstone file (`Tombstones.applyDeletes`) excluding deleted docs.
    */
  def openIndex(spark: SparkSession, indexDir: String,
                deltaDirs: Seq[String] = Nil,
                tombstones: Option[String] = None): IndexHandle =
    new IndexHandle(spark, indexDir, deltaDirs, tombstones)

  /** The reference's PSI execution as one call: duplicate-aware join of two
    * tables on equal-named key columns, plus the result report.
    */
  def psiExecute(left: DataFrame, right: DataFrame, keys: Seq[String],
                 kind: PsiJoin.JoinKind = PsiJoin.Inner,
                 nullRep: String = "NULL",
                 strategy: PsiJoin.Strategy = PsiJoin.Auto,
                 align: Boolean = false): PsiResult = {
    val out = PsiJoin.join(left, right, keys, kind, nullRep, strategy, align)
    PsiResult(out, PsiJoin.report(left, right, keys))
  }

  case class PsiResult(output: DataFrame, report: PsiJoin.Report)
}

/** A built index: metadata + query methods (the reference's UB-PSI online
  * phase — query against the prebuilt cache, psi/interface.cc:281-312).
  */
class IndexHandle(spark: SparkSession, val indexDir: String,
                  deltaDirs: Seq[String] = Nil,
                  tombstones: Option[String] = None) {
  val searcher = new Searcher(spark, indexDir, deltaDirs,
    tombstones = tombstones)
  def meta: IndexMeta = searcher.meta

  /** Conjunctive top-k (docId, score), hydrated with document keys. */
  def query(q: String, k: Int): DataFrame = searcher.searchDocs(q, k)

  /** Conjunctive top-k (docId, score) only. */
  def queryIds(q: String, k: Int) = searcher.search(q, k)

  /** Disjunctive top-k. */
  def queryOr(q: String, k: Int) = searcher.searchOr(q, k)

  /** Exact-phrase top-k (requires IndexConfig(positions = true) at build). */
  def queryPhrase(q: String, k: Int) = searcher.searchPhrase(q, k)

  /** Wildcard `prefix*` top-k (dictionary expansion → OR scoring). */
  def queryPrefix(prefix: String, k: Int) = searcher.searchPrefix(prefix, k)

  /** Facet counts over the full conjunctive match set. */
  def queryFacets(q: String, facetCol: String) = searcher.searchFacets(q, facetCol)

  /** Top-k with ±window-token snippets from the given corpus table. */
  def querySnippets(q: String, k: Int, files: DataFrame, window: Int = 8) =
    searcher.searchSnippets(q, k, files, window)

  /** Conjunctive top-k restricted by a docs-table metadata predicate. */
  def queryWhere(q: String, k: Int, predicate: org.apache.spark.sql.Column) =
    searcher.searchWhere(q, k, predicate)

  /** Many queries in one Spark job → (query_name, docId, score, rank). */
  def queryBatch(queries: Seq[(String, String, Int)],
                 conjunctive: Boolean = true): DataFrame =
    searcher.searchBatch(queries, conjunctive)
}
