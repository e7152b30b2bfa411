package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; the oracle). Scale path:
  * random-hyperplane LSH bucketing — candidates meet only inside matching
  * buckets, turning the O(n·q) scan into bucket-local joins, the same
  * hash-bucket decomposition the reference applies to its intersection
  * (psi/utils/hash_bucket_cache.cc) re-used for vector search.
  *
  * All math runs through codegen'd higher-order functions
  * (zip_with/aggregate/transform) — no UDFs.
  */
object Similarity {

  import Dedup.cosine

  /** Exact brute-force top-k neighbors for each query vector.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k, deterministic
    * tiebreak (cos desc, neighbor_id asc).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Hyperplane-component family: (plane, dim) → a deterministic double.
    * Same value on every executor — no RNG state to ship.
    */
  type PlaneFn = (Int, Column) => Column

  /** Default family: a fixed affine-mixed xxhash64 scaled to [-1, 1] —
    * codegen'd, the scale path.
    */
  val XxPlanes: PlaneFn = (plane, dim) =>
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Oracle-recomputable family (same md5 trick as [[Dedup.md5Hash60]]):
    * the 60-bit md5 prefix of "plane_dim" scaled to [-1, 1). The DuckDB
    * oracle recomputes the identical double — CAST of the same 60-bit
    * integer to double is correctly-rounded on both engines, and the
    * division/subtraction are literal-identical — so bucket codes, and
    * therefore the whole LSH candidate set, are value-checkable end to end.
    */
  val Md5Planes: PlaneFn = (plane, dim) =>
    conv(substring(md5(concat_ws("_",
      lit(plane).cast("string"), dim.cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") / lit((1L << 59).toDouble) - lit(1.0d)

  /** Sign-of-projection LSH code over `numPlanes` deterministic hyperplanes:
    * bit i = sign(v · p_i). Vectors in the same bucket are likely
    * cosine-close (random hyperplane LSH, Charikar'02).
    */
  def lshCode(vec: Column, numPlanes: Int, planeSeed: Int = 0,
              planes: PlaneFn = XxPlanes): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planes(planeSeed + p, i)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: candidates share any of `numTables` bucket
    * codes; exact cosine is computed only inside buckets. Recall < 1 by
    * construction; increase numTables for higher recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 12,
              numTables: Int = 4, planes: PlaneFn = XxPlanes): DataFrame = {
    // each table uses a distinct hyperplane family (plane count offset by
    // table index → disjoint (plane, dim) hash inputs)
    val cQ = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val cC = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    def codes(df: DataFrame, vcol: String): Column =
      array((0 until numTables).map { t =>
        struct(lit(t).as("table"),
          lshCode(col(vcol), numPlanes, planeSeed = t * 1024, planes).as("code"))
      }: _*)
    val qB = cQ.select(col("query_id"), col("qv"), explode(codes(cQ, "qv")).as("tc"))
      .select(col("query_id"), col("qv"), col("tc.table"), col("tc.code"))
    val cB = cC.select(col("neighbor_id"), col("cv"), explode(codes(cC, "cv")).as("tc"))
      .select(col("neighbor_id"), col("cv"), col("tc.table"), col("tc.code"))
    // score INSIDE the bucket join, then dedup multi-table repeats on the
    // (ids, cos) triple — never `distinct()` rows carrying the full vectors
    // (that would shuffle every vector once per table); a pair found in t
    // tables recomputes the same cosine t times, which is cheap compute
    // versus vector bytes through the exchange
    val scored = qB.join(cB, Seq("table", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Corpus×corpus embedding near-duplicate pairs — the SCALE path for
    * `Dedup.embeddingNearDupPairs` (which is the O(n²) oracle): vectors
    * meet only inside matching hyperplane-LSH buckets, so the pair space is
    * bucket-local; exact cosine verifies every candidate, multi-table
    * repeats dedup on the scored (id, id, cos) triple (64 B/row through the
    * exchange, not the vectors). Recall < 1 by construction; raise
    * numTables (or lower numPlanes) for higher recall — the recall-vs-cost
    * knob is asserted against brute force in OpsSpec.
    */
  // ------------------------------------------------------------------ IVF

  /** Per-centroid similarity scores as an array of (cos, cid) structs —
    * `array_max` of it is the nearest-centroid assignment, a sorted slice is
    * the query-side probe list. `cents` is an array<struct<cid,cv>> column.
    */
  private def centScores(vec: Column, cents: Column): Column =
    transform(cents, c =>
      struct(cosine(vec, c.getField("cv")).as("cos"), c.getField("cid").as("cid")))

  /** One-row DataFrame carrying the whole centroid table as an array column;
    * crossJoin(broadcast(·)) attaches it to every row so assignment/probing
    * are pure projections — the corpus crosses NO exchange to be assigned.
    */
  private def centroidRow(cents: DataFrame): DataFrame =
    cents.groupBy().agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))

  /** Train an IVF coarse quantizer: `nlist` deterministic seed vectors (the
    * corpus rows with the smallest xxhash64(id) — a seeded uniform sample, no
    * RNG state to ship) refined by `iters` Lloyd iterations of spherical
    * k-means. Each iteration is two small shuffles over the TRAINING SAMPLE
    * only (`trainSampleMod` thins the corpus: keep rows with
    * xxhash64(id) % mod == 0); at 100 TB you train on ~1M sampled vectors,
    * never the corpus. Input: (id, v double-array). Output: (cid, cv).
    */
  def trainCentroids(c: DataFrame, nlist: Int, iters: Int = 2,
                     trainSampleMod: Int = 1): DataFrame = {
    val spark = c.sparkSession
    val sample =
      if (trainSampleMod <= 1) c
      else c.filter(pmod(xxhash64(col("id")), lit(trainSampleMod.toLong)) === 0)
    var cents = c.select(col("id"), col("v"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = sample.crossJoin(broadcast(centroidRow(cents)))
        .select(col("v"),
          array_max(centScores(col("v"), col("cents"))).getField("cid").as("cid"))
      // element-wise mean per cluster: explode by position, avg, re-assemble.
      // r6: each iteration MATERIALIZES its centroid table (nlist × dim
      // doubles — driver-sized by construction, the stored-model shape) so
      // the next iteration's plan starts from a flat local relation instead
      // of re-nesting the whole previous iteration under its broadcast —
      // the per-(cid, pos) averages are computed by the identical
      // aggregation, so the trained values are unchanged.
      val next = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("x"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("x")))),
          p => p.getField("x")).as("cv"))
      cents = spark.createDataFrame(
        spark.sparkContext.parallelize(next.collect().toSeq, 1), next.schema)
    }
    cents
  }

  /** IVF (inverted-file) ANN top-k — the second scale path next to LSH,
    * FAISS-IVF-flat shape: a small trained centroid table partitions the
    * corpus into `nlist` inverted lists (each vector in EXACTLY one list, so
    * unlike LSH there are no duplicate candidates to merge); a query probes
    * its `nprobe` nearest lists and computes exact cosine only there.
    * Corpus-side assignment is a broadcast projection (no exchange); the only
    * corpus shuffle is the equi-join on the list id, and recall scales with
    * nprobe/nlist. Reference bucket-decomposition analog:
    * psi/utils/hash_bucket_cache.cc (buckets bound candidate pair space).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 2, trainSampleMod: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    // Materialize the trained quantizer ONCE: the centroid table is the
    // model artifact (nlist × dim doubles — driver-sized by construction,
    // like FAISS's stored coarse quantizer). Collecting breaks the lineage so
    // the Lloyd-iteration subtree is not re-executed under both the
    // corpus-assignment and the query-probe branches of the plan.
    val trained = trainCentroids(c, nlist, iters, trainSampleMod)
    val spark = corpus.sparkSession
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(trained.collect().toSeq, 1), trained.schema)
    val cRow = broadcast(centroidRow(cents))
    val lists = c.crossJoin(cRow)
      .select(col("id").as("neighbor_id"), col("v").as("cv"),
        array_max(centScores(col("v"), col("cents"))).getField("cid").as("cid"))
    val probes = q.crossJoin(cRow)
      .select(col("query_id"), col("qv"),
        explode(slice(reverse(array_sort(centScores(col("qv"), col("cents")))),
          1, nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cid").as("cid"))
    val scored = probes.join(lists, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      minCos: Double, numPlanes: Int = 12,
                      numTables: Int = 4, planes: PlaneFn = XxPlanes): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val codes = array((0 until numTables).map { t =>
      struct(lit(t).as("table"),
        lshCode(col("v"), numPlanes, planeSeed = t * 1024, planes).as("code"))
    }: _*)
    val b = c.select(col("id"), col("v"), explode(codes).as("tc"))
      .select(col("id"), col("v"), col("tc.table"), col("tc.code"))
    b.as("a").join(b.as("b"),
        col("a.table") === col("b.table") && col("a.code") === col("b.code") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCos)
      .groupBy("id_a", "id_b").agg(max(col("cos")).as("cos"))
  }
}
