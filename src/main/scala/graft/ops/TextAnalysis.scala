package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * Pure Column pipelines (codegen'd) — the whole feature extraction stays in
  * one WholeStageCodegen span over the scan.
  */
object TextAnalysis {

  def tokens(text: Column): Column = Dedup.tokens(text)

  /** Whitespace token count + BPE-ish subword count (runs of letters,
    * digits, or single punctuation — a cheap proxy for byte-pair tokenizers).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(filter(split(col(textCol), "\\s+"), t => length(t) > lit(0)))
        .as("ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("bpe_ish_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Quality features: length, mean word length, punctuation ratio,
    * stopword ratio, uppercase ratio — the standard cheap quality filters.
    */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String,
                      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nToks.as("n_tokens"),
      // mean token length (0 when empty)
      when(nToks > 0,
        aggregate(toks, lit(0.0d), (acc, t) => acc + length(t).cast("double")) /
          nToks.cast("double")).otherwise(lit(0.0d)).as("mean_tok_len"),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))).cast("double")
        ./(greatest(length(col(textCol)), lit(1)).cast("double"))
        .as("punct_ratio"),
      when(nToks > 0,
        size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
          nToks.cast("double")).otherwise(lit(0.0d)).as("stopword_ratio"),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[A-Z]", ""))).cast("double")
        ./(greatest(length(col(textCol)), lit(1)).cast("double"))
        .as("upper_ratio"))
  }

  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this")

  /** Language-ID heuristic: score each language profile by the fraction of
    * the doc's tokens found in that language's marker set; argmax with a
    * deterministic tiebreak (profile order). Marker sets are seeded from the
    * testdata corpus conventions; `profiles` is overridable per corpus.
    */
  def languageId(df: DataFrame, idCol: String, textCol: String,
                 profiles: Seq[(String, Seq[String])] = DefaultProfiles): DataFrame = {
    val toks = tokens(col(textCol))
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val scoreCols = profiles.zipWithIndex.map { case ((lang, markers), ord) =>
      val arr = array(markers.map(lit): _*)
      struct((size(filter(toks, t => array_contains(arr, t))).cast("double") / nToks).as("score"),
        lit(ord).as("ord"), lit(lang).as("lang"))
    }
    // argmax with an EXPLICIT deterministic tiebreak: score desc, then
    // profile declaration order — never rely on sort stability for ties
    val best = array_sort(array(scoreCols: _*),
      (l, r) => when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .otherwise(l.getField("ord") - r.getField("ord")))
    df.select(col(idCol),
      element_at(best, 1).getField("lang").as("pred_lang"),
      element_at(best, 1).getField("score").as("lang_score"))
  }

  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    ("en", Seq("the", "and", "of", "to", "is")),
    ("es", Seq("el", "la", "de", "que", "y")),
    ("fr", Seq("le", "la", "de", "et", "les")),
    ("de", Seq("der", "die", "und", "das", "ist")))

  /** Document fingerprint: sha256 of the normalized text (lowercase,
    * whitespace collapsed) — stable under formatting noise; plus a 64-bit
    * xxhash64 short fingerprint for cheap joins.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    df.select(col(idCol),
      sha2(norm, 256).as("fingerprint_sha256"),
      xxhash64(norm).as("fingerprint_64"))
  }

  /** Winnowed ROLLING-hash fingerprints (the MOSS scheme, Schleimer/Wilkerson/
    * Aiken 2003): Karp–Rabin hashes of every k-char gram of the normalized
    * text, then the minimum of each w-hash window (rightmost-min tiebreak),
    * deduplicated per doc. Guarantee: two documents sharing any substring of
    * length ≥ k + w - 1 share at least one fingerprint — partial-overlap
    * detection, which whole-document hashing cannot do.
    * Output: (id, fp: long, pos: int) — pos is the gram's character offset
    * in the normalized text.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 25, w: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        winnow(normalize(text), k, w).map { case (fp, pos) => (id, fp, pos) }
      }
      .toDF("id", "fp", "pos")
      .withColumnRenamed("id", idCol)
  }

  /** Candidate partial-overlap pairs: docs sharing ≥ minShared winnowed
    * fingerprints, with the shared count (join on fp, hot-fp cap bounds the
    * quadratic blowup on boilerplate — the same skew discipline as the
    * shingle-df cap in Dedup.ngramJaccardPairs).
    */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 25, w: Int = 16, minShared: Int = 2,
                   maxFpDf: Int = 200): DataFrame = {
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("doc"), col("fp")).distinct()
    val rare = fps.groupBy("fp").count().filter(col("count") <= maxFpDf)
      .select("fp")
    val fpr = fps.join(rare, "fp")
    val a = fpr.select(col("fp"), col("doc").as("doc_a"))
    val b = fpr.select(col("fp"), col("doc").as("doc_b"))
    a.join(b, Seq("fp")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** Whitespace-collapsed lowercase normalization shared by the fingerprint
    * family.
    */
  def normalize(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  /** Karp–Rabin rolling hash of every k-gram + robust winnowing: one pass,
    * O(n) — the hash of gram i+1 derives from gram i (subtract the outgoing
    * char's highest-power term, multiply by the base, add the incoming
    * char). 64-bit wraparound arithmetic; rightmost minimum per window so
    * runs of equal hashes fingerprint once.
    */
  private[ops] def winnow(s: String, k: Int, w: Int): Seq[(Long, Int)] = {
    val n = s.length
    if (n < k) return Nil
    val B = 1000003L
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val nGrams = n - k + 1
    val hs = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - s.charAt(i - 1) * bk) * B + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    if (nGrams <= w) {
      // one window: its minimum (rightmost)
      var best = 0
      i = 1
      while (i < nGrams) { if (hs(i) <= hs(best)) best = i; i += 1 }
      return Seq((hs(best), best))
    }
    val out = Seq.newBuilder[(Long, Int)]
    var lastPos = -1
    var wStart = 0
    while (wStart + w <= nGrams) {
      var best = wStart
      i = wStart + 1
      while (i < wStart + w) { if (hs(i) <= hs(best)) best = i; i += 1 }
      if (best != lastPos) { out += ((hs(best), best)); lastPos = best }
      wStart += 1
    }
    out.result()
  }
}
