package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** TEST-SCOPE stand-in for the Iceberg Spark runtime (no such jar exists in
  * this sandbox, and the build has zero network egress): registers the
  * `iceberg` data-source short name via the same ServiceLoader mechanism the
  * real `iceberg-spark-runtime` uses, so `CorpusSource.readFiles/readRefSha`
  * exercise their REAL code path — `spark.read.format("iceberg")
  * .options(snapshot pins).load(table)` resolved through Spark's source
  * registry — end-to-end in tests. The stub resolves the table identifier as
  * a parquet path and records the read options it received (snapshot-id /
  * as-of-timestamp) for assertion; swapping in the real runtime jar changes
  * nothing in main code.
  *
  * Lives in src/test only (with its META-INF/services entry in test
  * resources), so a production classpath never sees it.
  */
class IcebergStubSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "iceberg"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      sys.error("iceberg stub: no table identifier (path) supplied"))
    IcebergStubSource.record(path, parameters)
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override val schema: StructType =
        ctx.sparkSession.read.parquet(path).schema
      override def buildScan(): RDD[Row] =
        ctx.sparkSession.read.parquet(path).rdd
    }
  }
}

object IcebergStubSource {
  /** Options received per table identifier, for test assertions. */
  @volatile var received: Map[String, Map[String, String]] = Map.empty

  private[sources] def record(path: String, params: Map[String, String]): Unit =
    synchronized { received += (path -> params) }

  def reset(): Unit = synchronized { received = Map.empty }
}
