package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-table source abstraction — the `input_hint` contract is an ICEBERG
  * table `(repo, path, commit, lang, content)`; this sandbox has no Iceberg
  * runtime on the classpath, so the engine reads the same schema from plain
  * parquet by default while keeping the Iceberg read path (format selection,
  * snapshot pinning, schema validation) real and selectable per session
  * (reference scan analog: `ArrowCsvBatchProvider`,
  * psi/utils/arrow_csv_batch_provider.cc:142-174).
  *
  * Selection (first match wins):
  *   1. `spark.graft.source.format` session conf = `iceberg` | `parquet`
  *   2. `SPARK_GRAFT_SOURCE_FORMAT` env var
  *   3. default `parquet`
  *
  * Iceberg mode reads `location` as a table identifier (e.g.
  * `catalog.db.files`) with optional snapshot pinning via
  * `spark.graft.source.snapshotId` / `spark.graft.source.asOfTimestamp`
  * (exactly Iceberg's documented `snapshot-id` / `as-of-timestamp` read
  * options), so a multi-day 10^12-row build plans every stage against ONE
  * immutable snapshot — the corpus-immutability contract the build's
  * two-pass read (sha verify, then sort) requires. Parquet mode reads
  * `location/files.parquet`.
  */
object CorpusSource {

  val Columns = Seq("repo", "path", "commit", "lang", "content")

  private def conf(spark: SparkSession, key: String): Option[String] =
    spark.conf.getOption(key).filter(_.nonEmpty)

  def format(spark: SparkSession): String =
    conf(spark, "spark.graft.source.format")
      .orElse(sys.env.get("SPARK_GRAFT_SOURCE_FORMAT"))
      .getOrElse("parquet")

  /** Iceberg read options for snapshot pinning — pure so it is testable
    * without the Iceberg runtime.
    */
  def icebergReadOptions(snapshotId: Option[Long],
                         asOfTimestamp: Option[Long]): Map[String, String] = {
    require(snapshotId.isEmpty || asOfTimestamp.isEmpty,
      "pin either snapshot-id or as-of-timestamp, not both")
    snapshotId.map(id => Map("snapshot-id" -> id.toString))
      .orElse(asOfTimestamp.map(ts => Map("as-of-timestamp" -> ts.toString)))
      .getOrElse(Map.empty)
  }

  /** The files table at `location`, schema-validated to the input_hint
    * columns. Column pruning/predicate pushdown happen downstream through
    * Catalyst in both formats (Iceberg's DSv2 scan also prunes partitions
    * and files by its column stats).
    */
  def readFiles(spark: SparkSession, location: String): DataFrame = {
    val df = format(spark) match {
      case "parquet" => spark.read.parquet(s"$location/files.parquet")
      case "iceberg" =>
        val opts = icebergReadOptions(
          conf(spark, "spark.graft.source.snapshotId").map(_.toLong),
          conf(spark, "spark.graft.source.asOfTimestamp").map(_.toLong))
        spark.read.format("iceberg").options(opts).load(location)
      case other => sys.error(s"unknown corpus source format '$other' " +
        "(spark.graft.source.format must be parquet or iceberg)")
    }
    val missing = Columns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"corpus table at $location is missing required columns $missing " +
        s"(input_hint schema: ${Columns.mkString(", ")})")
    df
  }

  /** The sha256 sidecar `(repo, path, commit, ref_sha256)` used by the
    * per-row content invariant. With an Iceberg corpus the sidecar location
    * is its own table identifier under `spark.graft.source.refShaTable`,
    * pinnable via `spark.graft.source.refShaSnapshotId` /
    * `refShaAsOfTimestamp` (its OWN snapshot — a different table than the
    * corpus — so a mid-build sidecar rewrite cannot make the invariant check
    * compare a pinned corpus against a moved sidecar); parquet mode keeps
    * the `<location>/ref_sha.parquet` convention.
    */
  def readRefSha(spark: SparkSession, location: String): DataFrame =
    format(spark) match {
      case "iceberg" =>
        val table = conf(spark, "spark.graft.source.refShaTable")
          .getOrElse(sys.error("iceberg corpus needs spark.graft.source.refShaTable"))
        val opts = icebergReadOptions(
          conf(spark, "spark.graft.source.refShaSnapshotId").map(_.toLong),
          conf(spark, "spark.graft.source.refShaAsOfTimestamp").map(_.toLong))
        spark.read.format("iceberg").options(opts).load(table)
      case _ => spark.read.parquet(s"$location/ref_sha.parquet")
    }
}
