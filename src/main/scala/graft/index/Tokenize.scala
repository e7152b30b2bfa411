package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-aware tokenizer: lowercase, extract runs of [a-z0-9_].
  *
  * Implemented as `regexp_extract_all` on the POSITIVE class rather than
  * `split` on the negated class: the two are semantically identical
  * (extracting token-character runs == splitting on non-token runs and
  * dropping empties), but the JDK's negated-character-class matcher
  * (Pattern$CharPredicate.negate) collapses under executor-thread
  * concurrency on this JVM (~60× measured slowdown at 32 threads, see
  * tools/Probe), while the positive class runs at full speed. Still a
  * codegen'd built-in — the tokenize→explode path stays in whole-stage
  * codegen.
  *
  * The analog of the reference's composite-key normalization (`KeysJoin`,
  * psi/utils/key.cc:185-187): build and query MUST use the identical
  * function (like the reference's `server_secret_key_path` parity
  * requirement).
  */
object Tokenize {
  val TokenPattern = "[a-z0-9_]+"

  /** Column of tokens (non-empty by construction). */
  def termsCol(content: Column): Column =
    regexp_extract_all(lower(content), lit(TokenPattern), lit(0))

  /** Driver/JVM-side twin — must match `termsCol` exactly. */
  def tokenize(s: String): Array[String] = {
    val m = java.util.regex.Pattern.compile(TokenPattern).matcher(s.toLowerCase)
    val out = Array.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }
}
