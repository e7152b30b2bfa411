package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame/Column pipelines (codegen'd built-ins,
  * no UDFs) so filters/projections push down and aggregations keep map-side
  * partial combine. Pair-generating joins are equi-joins on
  * shingle/band/bucket keys — shuffle-partitioned exactly like the engine's
  * posting build, with df-based frequency caps defusing hot-key skew.
  */
object Dedup {

  /** Tokens column: lowercase [a-z0-9_] runs (shared with TextAnalysis;
    * same positive-class extraction as graft.index.Tokenize — see there for
    * why extraction beats splitting on the negated class).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9_]+"), lit(0))

  // ---------------------------------------------------------------- exact

  /** Exact dedup summary over a text column. */
  def exactStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(count(lit(1)).as("n_docs"),
      countDistinct(col(textCol)).as("n_distinct"))

  /** Exact duplicate groups: canonical (min id) representative + group size;
    * keys by full text equality via hash-groupBy.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keep_id"), col("n_copies"))

  /** Rows surviving exact dedup (keep the min id per distinct text). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      df.groupBy(col(textCol)).agg(min(col(idCol)).as(idCol)),
      Seq(textCol, idCol), "left_semi")

  // ------------------------------------------------------- n-gram Jaccard

  /** Distinct word k-shingles per doc. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("doc"), tokens(col(textCol)).as("toks"))
      .select(col("doc"), explode(
        transform(sequence(lit(0), size(col("toks")) - k),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(k))))).as("shingle"))
      .filter(size(split(col("shingle"), " ")) === k)
      .distinct()

  /** Near-duplicate pairs by exact k-shingle Jaccard ≥ minJaccard.
    *
    * Scale shape: shingle-keyed equi-join with a document-frequency cap on
    * shingles (a shingle in > maxShingleDf docs is dropped from pairing —
    * the hot-term salting analog: it bounds every join key's fan-out, and
    * ubiquitous shingles carry no near-dup signal).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, minJaccard: Double = 0.8,
                        maxShingleDf: Int = 100): DataFrame = {
    val sh = shingles(df, idCol, textCol, k)
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("sdf"))
      .filter(col("sdf") <= maxShingleDf)
    val shR = sh.join(rare.select("shingle"), Seq("shingle"), "left_semi")
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = shR.as("a").join(shR.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ------------------------------------------------------------- MinHash

  /** Deterministic 64-bit hash of a shingle for permutation `i`:
    * xxhash64(shingle, i) — Spark's codegen'd xxhash64 with the permutation
    * index as a seed column. MinHash signature = per-doc min over shingles,
    * computed as one groupBy with `min` per permutation (map-side combine).
    */
  def minhashSignatures(sh: DataFrame, numPerms: Int): DataFrame = {
    val aggs = (0 until numPerms).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"mh_$i"))
    sh.groupBy("doc").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding: docs sharing any band of `rowsPerBand`
    * consecutive signature components become a candidate pair
    * (shingle→minhash→band→bucket-join). Candidates are then verified with
    * exact shingle Jaccard — the classic two-phase near-dup pipeline.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4,
                      minJaccard: Double = 0.5): DataFrame = {
    val sh = shingles(df, idCol, textCol, k)
    val sig = minhashSignatures(sh, numPerms)
    val numBands = numPerms / rowsPerBand
    val bands = sig.select(col("doc"), explode(array((0 until numBands).map { bnd =>
      struct(lit(bnd).as("band"),
        hash((bnd * rowsPerBand until (bnd + 1) * rowsPerBand).map(i => col(s"mh_$i")): _*)
          .as("bucket"))
    }: _*)).as("bb"))
      .select(col("doc"), col("bb.band"), col("bb.bucket"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val pairShingleHits = cand
      .join(sh.select(col("doc").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    pairShingleHits
      .join(sizes.select(col("doc").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc: sign-sum of xxhash64 bits over tokens,
    * expressed as 64 per-bit aggregations (codegen'd, no UDF).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$i")
    }
    val agg = toks.groupBy("doc").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxDist, candidate-generated
    * by 4×16-bit band blocking (any equal 16-bit quarter → candidate), the
    * standard Manku-style scheme.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val bands = sh.select(col("doc"), col("simhash"), explode(array(
      (0 until 4).map(i => struct(lit(i).as("band"),
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL).as("chunk"))): _*)).as("bb"))
      .select(col("doc"), col("simhash"), col("bb.band"), col("bb.chunk"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.simhash").as("h_a"), col("b.simhash").as("h_b"))
      .distinct()
    cand.withColumn("dist", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("dist") <= maxDist)
      .select("doc_a", "doc_b", "dist")
  }

  // ------------------------------------------------- embedding near-dup

  /** Cosine similarity of two float-array columns via zip_with + aggregate
    * (codegen'd higher-order functions — no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Embedding near-duplicate pairs: cosine ≥ minCos over all id-ordered
    * pairs. Brute-force O(n²) baseline — the oracle path; the scale path is
    * `Similarity.lshNearDupPairs`.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            minCos: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
