package graft.tools

import org.apache.spark.sql.SparkSession

import graft.oracle.OracleBm25
import graft.query.Searcher

/** Rank-identity check at LARGE corpus scale, where the window-based test
  * oracle is infeasible: compares the engine's top-k against the window-free
  * scalable oracle (docIds from the engine's published docs table joined to
  * the raw corpus on the composite key).
  * Usage: runMain graft.tools.ScaleCheck <corpusDir> <indexDir> <cpus> <k> <query...>
  * A query prefixed `or:` runs the DISJUNCTIVE path (searchOr — WAND pivoting
  * + block-max pruning) against the OR-mode scalable oracle, proving pruning
  * exactness where it matters: hot lists at scale with a risen θ. A query
  * prefixed `phrase:` runs the positional path (searchPhrase; the index must
  * be built with --positions) against the window-free phrase oracle. A query
  * prefixed `where:<sql-predicate>|` runs the metadata-filtered path
  * (searchWhere) against the predicate-restricted scalable oracle, e.g.
  * `where:lang = 'scala'|import def`. A query prefixed `prefix:` runs the
  * wildcard path (searchPrefix) against an INDEPENDENTLY-expanded OR oracle
  * (completions recomputed from the raw corpus tokens with the same
  * df-desc/term-asc/cap-64 rule). A query prefixed `del:` first tombstones
  * every 5th doc and runs the deleted path (exclusion lists in the kernel)
  * against the scalable oracle restricted to the survivors — Lucene
  * semantics, so survivor scores must be bit-identical.
  * Exits 3 on mismatch.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val (corpusDir, indexDir, cpus, k) = (args(0), args(1), args(2), args(3).toInt)
    val queries = args.drop(4).toSeq
    require(queries.nonEmpty, "give at least one query")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val searcher = new Searcher(spark, indexDir)
    val withId = spark.read.parquet(s"$corpusDir/files.parquet")
      .join(spark.read.parquet(s"$indexDir/docs.parquet")
        .select("docId", "repo", "path", "commit"),
        Seq("repo", "path", "commit"))
      .select("docId", "content")
    var bad = false
    val docsMeta = spark.read.parquet(s"$indexDir/docs.parquet")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // del: mode — tombstone every 5th doc once, query through the exclusion
    // path; the oracle is restricted to the survivors with FULL-corpus stats
    lazy val delSearcher: Searcher = {
      val path = java.nio.file.Files
        .createTempDirectory("scalecheck-tombs").resolve("tombs.parquet").toString
      val keys = docsMeta.filter($"docId" % 5 === 0)
        .select("repo", "path", "commit")
      val n = graft.index.Tombstones.applyDeletes(spark, keys, Seq(indexDir), path)
      println(s"[scalecheck] tombstoned $n docs (docId % 5 == 0)")
      new Searcher(spark, indexDir, tombstones = Some(path))
    }
    for (raw <- queries) {
      val mode = if (raw.startsWith("or:")) "OR"
                 else if (raw.startsWith("phrase:")) "PHRASE"
                 else if (raw.startsWith("where:")) "WHERE"
                 else if (raw.startsWith("prefix:")) "PREFIX"
                 else if (raw.startsWith("del:")) "DEL" else "AND"
      val (pred, q) =
        if (mode == "WHERE") {
          val body = raw.stripPrefix("where:")
          val i = body.indexOf('|')
          require(i > 0, s"where: query needs '<predicate>|<query>', got '$raw'")
          (body.take(i), body.drop(i + 1))
        } else ("", raw.stripPrefix("or:").stripPrefix("phrase:")
          .stripPrefix("prefix:").stripPrefix("del:"))
      val t0 = System.nanoTime()
      val hits = mode match {
        case "OR"     => searcher.searchOr(q, k)
        case "PHRASE" => searcher.searchPhrase(q, k)
        case "WHERE"  => searcher.searchWhere(q, k, expr(pred))
        case "PREFIX" => searcher.searchPrefix(q, k)
        case "DEL"    => delSearcher.search(q, k)
        case _        => searcher.search(q, k)
      }
      val got = hits.collect().map(h => (h.docId, h.score))
      val tq = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val want = (mode match {
        case "PHRASE" => OracleBm25.topKPhraseScalable(withId, q, k)
        case "WHERE"  => OracleBm25.topKScalable(withId, q, k, restrictTo =
          Some(docsMeta.filter(expr(pred)).select("docId")))
        case "PREFIX" =>
          // independent expansion: completions recomputed from the RAW
          // corpus tokens (df desc, term asc, cap 64 — the same public
          // rule), with the same tokenizer normalization the engine applies
          // to the prefix itself; an empty expansion is a legitimate
          // compare (engine must be empty too), not an abort
          val normPrefix = graft.index.Tokenize.tokenize(q).headOption.getOrElse(q)
          val expansion = withId
            .select(explode(array_distinct(
              graft.index.Tokenize.termsCol($"content"))).as("tok"))
            .filter($"tok".startsWith(normPrefix))
            .groupBy("tok").agg(count(lit(1)).as("df"))
            .orderBy($"df".desc, $"tok".asc).limit(64)
            .select("tok").as[String].collect()
          if (expansion.isEmpty) spark.emptyDataset[graft.Hit].toDF()
          else OracleBm25.topKScalable(withId, expansion.mkString(" "), k,
            conjunctive = false)
        case "DEL" => OracleBm25.topKScalable(withId, q, k, restrictTo =
          Some(docsMeta.filter($"docId" % 5 =!= 0).select("docId")))
        case m => OracleBm25.topKScalable(withId, q, k, conjunctive = m == "AND")
      }).collect().map(r => (r.getLong(0), r.getDouble(1)))
      val to = (System.nanoTime() - t1) / 1e9
      val ok = got.sameElements(want)
      println(f"[scalecheck] $mode '$q' k=$k engine=$tq%.2fs oracle=$to%.2fs -> " +
        (if (ok) s"MATCH (${got.length} hits, rank-identical)" else "MISMATCH"))
      if (!ok) {
        println(s"  got  ${got.toSeq}\n  want ${want.toSeq}")
        bad = true
      }
    }
    spark.stop()
    if (bad) sys.exit(3)
  }
}
