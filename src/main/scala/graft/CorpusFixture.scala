package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}

/** The fixed "t2" corpus + index used by the driver-facing correctness
  * queries (SparkEntry): deterministic, independent of sfDir, materialized
  * once under the repo's data/ dir so the DuckDB oracle can read the same
  * parquet via an absolute path.
  *
  * Writes are ATOMIC: a (re)build lands in a sibling temp dir that is
  * renamed into place only when complete — a reader (gate query or the
  * driver's DuckDB oracle) can never observe a half-written corpus or index.
  * This is the temp+rename discipline of SURVEY §7.4(4) (the round-1
  * `q_dict_topdf` hash-fail was a racing in-place rebuild, VERDICT r1 §wrong).
  */
object CorpusFixture {
  val corpusDir = "/root/repo/data/corpus_t2"
  val indexDir = "/root/repo/data/index_t2"
  val cfg: CorpusGen.Config = CorpusGen.Config(numDocs = 4000L, seed = 42L)
  val idxCfg: IndexConfig = IndexConfig(docsPerShard = 512, positions = true)

  @volatile private var ready = false

  private def deleteRecursively(p: Path): Unit = FsUtil.deleteRecursively(p)

  /** Build into `target.tmp`, then swap into place (delete stale target +
    * rename). The rename is atomic on a local filesystem; the delete→rename
    * window is the only non-atomic instant and is only reachable when the
    * target was stale (wrong fingerprint) to begin with.
    */
  private def atomically(target: String)(build: String => Unit): Unit = {
    val tmp = Paths.get(target + ".tmp")
    deleteRecursively(tmp)
    build(tmp.toString)
    val dst = Paths.get(target)
    deleteRecursively(dst)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
  }

  private def corpusFresh: Boolean =
    Files.exists(Paths.get(s"$corpusDir/files.parquet/_SUCCESS")) &&
      Files.exists(Paths.get(s"$corpusDir/ref_sha.parquet/_SUCCESS"))

  private def indexFresh: Boolean =
    Files.exists(Paths.get(s"$indexDir/meta.json")) &&
      IndexBuilder.readMeta(indexDir).fingerprint == idxCfg.fingerprint

  /** Idempotent: generates the corpus and builds the index only when absent
    * or built with a different config (fingerprint mismatch — e.g. a stale
    * non-positional index from an older build). Call this ONCE before a gate
    * run (Verify does) so every query reads a settled fixture.
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (ready) return
    if (!corpusFresh)
      atomically(corpusDir)(tmp => CorpusGen.writeCorpus(spark, cfg, tmp))
    if (!indexFresh)
      atomically(indexDir)(tmp => IndexBuilder.buildFast(spark, corpusDir, tmp, idxCfg))
    ready = true
  }

  /** DuckDB-readable path of the corpus files table. */
  val filesGlob = s"$corpusDir/files.parquet/*.parquet"
}
