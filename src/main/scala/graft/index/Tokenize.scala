package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-aware tokenizer: lowercase, split on anything outside [a-z0-9_].
  *
  * Kept to built-in codegen'd `functions` (split/lower/filter) rather than a
  * UDF — the whole tokenize→explode path stays inside whole-stage codegen.
  * The analog of the reference's composite-key normalization (`KeysJoin`,
  * psi/utils/key.cc:185-187): build and query MUST use the identical function
  * (like the reference's `server_secret_key_path` parity requirement).
  */
object Tokenize {
  val SplitPattern = "[^a-z0-9_]+"

  /** Column of non-empty tokens. */
  def termsCol(content: Column): Column =
    filter(split(lower(content), SplitPattern), t => length(t) > lit(0))

  /** Driver/JVM-side twin — must match `termsCol` exactly. */
  def tokenize(s: String): Array[String] =
    s.toLowerCase.split(SplitPattern).filter(_.nonEmpty)
}
