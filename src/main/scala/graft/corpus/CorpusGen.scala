package graft.corpus

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.FileRow

/** Deterministic synthetic source-code corpus (FIXTURES.md §2).
  *
  * Every row is a pure function of (seed, id): the corpus is identical across
  * runs, partitionings and parallelism levels — the stand-in for the
  * reference's deterministic `CreateRangeItems` fixtures
  * (psi/utils/test_utils.h:32-38). No wall-clock, no unseeded RNG.
  *
  * Content mixes (a) a Zipf-ish hot keyword pool (produces the skewed posting
  * lists the docId-shard "salting" must handle), (b) mid-frequency
  * identifiers `util_%d`, (c) rare near-unique identifiers `sym_%08x`
  * (selective query terms), (d) per-language boilerplate. All tokens are
  * `[a-z0-9_]+` so the tokenizer round-trips exactly.
  */
object CorpusGen {

  /** @param idOffset shifts the document id space: a corpus generated with
    *   (numDocs = n, idOffset = m) is exactly docs m..m+n-1 of the corpus
    *   (numDocs = m+n) — disjoint slices of one logical corpus, for
    *   incremental-ingest scenarios.
    */
  case class Config(numDocs: Long, seed: Long = 42L, numRepos: Int = 40,
                    midPool: Int = 500, rarePool: Long = 1L << 22,
                    idOffset: Long = 0L)

  val keywords: Array[String] = Array(
    "import", "def", "class", "val", "var", "return", "if", "else", "for",
    "while", "match", "case", "new", "object", "trait", "extends", "with",
    "private", "public", "static", "void", "int", "string", "true", "false",
    "null", "this", "super", "try", "catch", "finally", "throw", "lazy",
    "override", "package", "final", "sealed", "implicit", "type", "yield")

  private val langs = Array("scala", "java", "py", "cpp", "go", "rs")
  private val exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py",
    "cpp" -> "cc", "go" -> "go", "rs" -> "rs")

  /** SplitMix64 — a public-domain splittable PRNG step; gives an independent
    * stream per (seed, id) without any shared state.
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Pure row constructor. */
  def rowFor(id: Long, cfg: Config): FileRow = {
    val rng = new java.util.Random(mix64(cfg.seed ^ (id * 0x9e3779b97f4a7c15L)))
    val lang = langs(rng.nextInt(langs.length))
    val repo = f"repo-${rng.nextInt(cfg.numRepos)}%04d"
    val path = s"src/d${id % 97}/f$id.${exts(lang)}"
    val commit = f"${mix64(id ^ cfg.seed)}%016x${mix64(id + 1)}%016x"
    val nTokens = 30 + rng.nextInt(450)
    val sb = new StringBuilder(nTokens * 8)
    sb.append("package ").append(s"pkg_${id % 13}").append('\n')
    var i = 0
    var sinceNl = 0
    while (i < nTokens) {
      val r = rng.nextDouble()
      val tok =
        if (r < 0.55) {
          // Zipf-ish: rank ~ floor of exponential over the keyword pool
          val z = math.min(keywords.length - 1,
            (-math.log(1.0 - rng.nextDouble()) * 6.0).toInt)
          keywords(z)
        } else if (r < 0.85) s"util_${rng.nextInt(cfg.midPool)}"
        else f"sym_${(mix64(rng.nextLong()) & 0xffffffffL) % cfg.rarePool}%08x"
      sb.append(tok)
      sinceNl += 1
      if (sinceNl >= 8 && rng.nextDouble() < 0.3) { sb.append('\n'); sinceNl = 0 }
      else sb.append(' ')
      i += 1
    }
    FileRow(repo, path, commit, lang, sb.toString)
  }

  /** Distributed deterministic generation — `spark.range` is a narrow,
    * splittable source; each row derives only from its id, so the result is
    * independent of partition count.
    */
  def generate(spark: SparkSession, cfg: Config): Dataset[FileRow] = {
    import spark.implicits._
    val c = cfg
    spark.range(cfg.numDocs).as[Long].map(id => rowFor(c.idOffset + id, c))
  }

  /** Materialize the corpus plus the reference sha256 sidecar used by the
    * per-row ingest invariant (input_hint: content sha256 equality; reference
    * analog psi/utils/csv_checker.cc:104).
    */
  def writeCorpus(spark: SparkSession, cfg: Config, dir: String): Unit = {
    import spark.implicits._
    val files = generate(spark, cfg)
    files.write.mode("overwrite").parquet(s"$dir/files.parquet")
    val c = cfg
    spark.range(cfg.numDocs).as[Long]
      .map { id =>
        val r = rowFor(c.idOffset + id, c)
        (r.repo, r.path, r.commit, sha256Hex(r.content))
      }
      .toDF("repo", "path", "commit", "ref_sha256")
      .write.mode("overwrite").parquet(s"$dir/ref_sha.parquet")
  }

  /** The fixed reference query set (FIXTURES.md §3), derived from the seed:
    * (name, query, k). Rare terms are actual sym tokens of known docs so each
    * class exercises the intended path.
    */
  def referenceQuerySet(cfg: Config): Seq[(String, String, Int)] = {
    // pull rare/mid tokens deterministically out of two sample docs
    def tokensOf(id: Long): Array[String] =
      graft.index.Tokenize.tokenize(rowFor(id, cfg).content)
    val rare1 = tokensOf(7L).find(_.startsWith("sym_")).getOrElse("sym_00000000")
    val rare2 = tokensOf(11L).find(_.startsWith("sym_")).getOrElse("sym_00000001")
    val mid = tokensOf(3L).find(_.startsWith("util_")).getOrElse("util_1")
    Seq(
      ("single_rare", rare1, 10),
      ("single_hot", "import", 10),
      ("and_rare_hot", s"$rare1 import", 10),
      ("and_mid_hot", s"$mid import def", 10),
      ("and_4term", s"$mid import def class", 10),
      ("topk_1", "import val", 1),
      ("topk_100", "import val", 100),
      ("no_hit", "zzqx_not_in_pool", 10),
      ("repeated_term", s"$mid $mid import", 10),
      ("and_two_rare", s"$rare1 $rare2", 10)
    )
  }
}
