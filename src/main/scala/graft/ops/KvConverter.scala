package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** APSI key-value converter — the Spark analog of the reference's
  * `ApsiCsvConverter` (psi/utils/csv_converter.h:31-80, .cc:137-138,251-256):
  * for duplicate-key PIR, all labels of one row are spliced with the COLUMN
  * delimiter 0x1E, then all rows sharing a key are joined with the ROW
  * delimiter 0x1F, yielding a `(key, value)` table APSI can serve; the
  * reverse extraction splits a result value back into one output row per
  * original row with the original label columns.
  *
  * Pure Column pipeline: `collect_list` + `array_join` keep the merge one
  * hash aggregation on the KEY (map-side combinable); the inverse is an
  * `explode(split(...))`. Rows within a key are sorted (`sort_array`) so the
  * merged value is deterministic regardless of partitioning — the reference
  * reads its CSV in file order, which a distributed shuffle cannot and
  * should not reproduce.
  */
object KvConverter {

  /** Between labels of ONE row (reference kColumnDelimiter = 0x1E). */
  val ColumnDelimiter = "\u001e"

  /** Between ROWS sharing a key (reference kRowDelimiter = 0x1F). */
  val RowDelimiter = "\u001f"

  /** `MergeColumnAndRow`: one output row per distinct key with the merged
    * value and the per-key row count (the reference's optional
    * key_count_file rides along as a column).
    * Output schema: (key, value, key_count).
    */
  def mergeLabels(df: DataFrame, keyCol: String,
                  labelCols: Seq[String]): DataFrame = {
    // concat_ws silently DROPS null arguments, which would shift the
    // remaining labels into the wrong columns on extraction — coerce NULL to
    // the empty string first (CSV semantics, same as the reference's
    // file-based converter which has no NULL representation at all).
    // A label CONTAINING a delimiter byte would silently corrupt the merged
    // value and shift columns on extraction — the reference's CSV domain
    // implicitly excludes 0x1E/0x1F, but an arbitrary Spark string column
    // does not, so fail loudly AT MERGE TIME via a codegen'd raise_error
    // guard (no extra driver-side validation pass; the check rides the same
    // projection).
    def checked(c: String): Column = {
      val v = coalesce(col(c), lit(""))
      when(v.contains(ColumnDelimiter) || v.contains(RowDelimiter),
        raise_error(concat(
          lit(s"KvConverter: label column '$c' contains a reserved APSI " +
            "delimiter byte (0x1E/0x1F) in value: "), v)))
        .otherwise(v)
    }
    val rowValue = concat_ws(ColumnDelimiter, labelCols.map(checked): _*)
    df.groupBy(col(keyCol).as("key"))
      .agg(
        array_join(sort_array(collect_list(rowValue)), RowDelimiter).as("value"),
        count(lit(1)).as("key_count"))
  }

  /** `ExtractQueryTo`: the key column alone, deduplicated (the reference
    * leaves duplicate checking to APSI; a distributed query set wants the
    * dedup here).
    */
  def extractQuery(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).as("key")).distinct()

  /** `ExtractResult`: invert [[mergeLabels]] — split the merged value on the
    * row delimiter, explode, split each row chunk on the column delimiter
    * into the named label columns. Roundtrip identity:
    * `extractResult(mergeLabels(df)) == df` (as a multiset of rows).
    */
  def extractResult(kv: DataFrame, keyName: String,
                    labelNames: Seq[String]): DataFrame = {
    val rows = kv.select(col("key"),
      explode(split(col("value"), RowDelimiter)).as("row_value"))
    val parts = split(col("row_value"), ColumnDelimiter)
    val labelCols = labelNames.zipWithIndex.map { case (n, i) =>
      parts.getItem(i).as(n)
    }
    rows.select((col("key").as(keyName) +: labelCols): _*)
  }
}
