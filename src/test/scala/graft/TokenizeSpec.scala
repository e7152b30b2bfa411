package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.index.Tokenize

/** The three tokenizer implementations must agree exactly: the SQL
  * definition (`termsCol`, regexp over lower()), the JVM regex twin
  * (`tokenizeRegex`), and the ASCII fast-path scanner (`tokenize`) plus the
  * zero-allocation `tokenCount` / `token_count` Expression. Build and query
  * share these, so a single divergence breaks rank identity (the
  * server_secret_key_path parity analog, SURVEY.md §3.2).
  */
class TokenizeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // strings over a code-like alphabet plus separators, casing, digits,
  // underscores, and occasional non-ASCII (forces the regex fallback)
  private val codeChar: Gen[Char] = Gen.frequency(
    (20, Gen.alphaNumChar), (4, Gen.const('_')), (6, Gen.oneOf(' ', '\n', '\t')),
    (3, Gen.oneOf('.', '(', ')', '{', '}', ';', '-', '+', '"')),
    (1, Gen.oneOf('é', 'Ω', '中', 'K' /* Kelvin K → lowercases to 'k' */ ,
      'İ' /* İ → lowercases to two chars */)))
  private val codeString: Gen[String] =
    Gen.listOf(codeChar).map(_.mkString)

  test("scanner tokenize == regex tokenize on arbitrary strings") {
    check(Prop.forAll(codeString) { s =>
      Tokenize.tokenize(s).sameElements(Tokenize.tokenizeRegex(s))
    })
  }

  test("tokenCount == tokenize.length on arbitrary strings") {
    check(Prop.forAll(codeString) { s =>
      Tokenize.tokenCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) ==
        Tokenize.tokenize(s).length
    })
  }

  test("scanner lowercases and splits exactly like the SQL column") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val samples = Seq(
      "import Def_Class99 foo.bar(BAZ_1)", "", "___", "a", "A\nB\tc",
      "x" * 5000, "KKk İstanbul é中文 mix_01") ++
      (0L until 50L).map(i => graft.corpus.CorpusGen.rowFor(i,
        graft.corpus.CorpusGen.Config(numDocs = 50)).content)
    val df = samples.toDF("content")
    graft.functions.VByteFunctions.register(spark)
    val rows = df.select(
      Tokenize.termsCol(col("content")).as("sqlToks"),
      size(Tokenize.termsCol(col("content"))).as("sqlN"),
      expr("token_count(content)").as("exprN"),
      col("content")).collect()
    rows.foreach { r =>
      val sqlToks = r.getSeq[String](0)
      val jvmToks = Tokenize.tokenize(r.getString(3)).toSeq
      assert(jvmToks == sqlToks, s"tokens diverge on '${r.getString(3).take(60)}'")
      assert(r.getInt(1) == r.getInt(2), "token_count != size(termsCol)")
    }
  }
}
