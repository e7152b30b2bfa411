package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}

/** The fixed "t2" corpus + index used by the driver-facing correctness
  * queries (SparkEntry): deterministic, independent of sfDir, materialized
  * once under the repo's data/ dir so the DuckDB oracle can read the same
  * parquet via an absolute path.
  */
object CorpusFixture {
  val corpusDir = "/root/repo/data/corpus_t2"
  val indexDir = "/root/repo/data/index_t2"
  val cfg: CorpusGen.Config = CorpusGen.Config(numDocs = 4000L, seed = 42L)
  val idxCfg: IndexConfig = IndexConfig(docsPerShard = 512, positions = true)

  @volatile private var ready = false

  /** Idempotent: generates the corpus and builds the index only when absent
    * or built with a different config (fingerprint mismatch — e.g. a stale
    * non-positional index from an older build).
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    if (ready) return
    if (!Files.exists(Paths.get(s"$corpusDir/files.parquet/_SUCCESS")))
      CorpusGen.writeCorpus(spark, cfg, corpusDir)
    val metaPath = Paths.get(s"$indexDir/meta.json")
    val fresh = Files.exists(metaPath) &&
      IndexBuilder.readMeta(indexDir).fingerprint == idxCfg.fingerprint
    if (!fresh)
      IndexBuilder.buildFast(spark, corpusDir, indexDir, idxCfg)
    ready = true
  }

  /** DuckDB-readable path of the corpus files table. */
  val filesGlob = s"$corpusDir/files.parquet/*.parquet"
}
