package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators: dedup family, similarity search, text
  * analysis, multimodal plumbing. Synthetic fixtures with planted duplicates
  * so recall properties are checkable exactly.
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 30 base docs + planted near-duplicates of doc 0 and exact dup of doc 5. */
  lazy val docs = {
    val rng = new scala.util.Random(7)
    val base = (0 until 30).map { i =>
      val toks = (0 until 40).map(_ => s"w${rng.nextInt(200)}")
      (i.toLong, toks.mkString(" "))
    }
    val nearDup = (100L, base(0)._2.replaceFirst("w\\d+", "changed"))
    val exactDup = (101L, base(5)._2)
    (base :+ nearDup :+ exactDup).toDF("doc_id", "text")
  }

  test("exact dedup finds the planted exact duplicate") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(groups.length == 1 && groups.head.getLong(0) == 5L &&
      groups.head.getLong(1) == 2L)
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() == docs.count() - 1)
  }

  test("ngram Jaccard finds the planted near-duplicate pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, minJaccard = 0.5, maxShingleDf = 1000)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 100L && j > 0.8 })
    assert(pairs.exists { case (a, b, j) => a == 5L && b == 101L && j == 1.0 })
  }

  test("minhash LSH candidates ⊇ high-Jaccard pairs, verified pairs exact") {
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 3, numPerms = 16, rowsPerBand = 4, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, minJaccard = 0.9, maxShingleDf = 1000)
      .as[(Long, Long, Double)].collect()
    // every ≥0.9-Jaccard pair must be caught by LSH at these band settings
    exact.foreach { case (a, b, j) =>
      assert(lsh.contains((a, b)), s"LSH missed pair ($a,$b) j=$j")
      assert(math.abs(lsh((a, b)) - j) < 1e-12)
    }
  }

  test("simhash: identical docs share hash; near-dups within distance") {
    val sh = Dedup.simhash(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(sh(5L) == sh(101L))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 10)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 5L && p._2 == 101L && p._3 == 0))
    assert(pairs.forall(_._3 <= 10))
  }

  lazy val vecs = {
    val rng = new scala.util.Random(11)
    val base = (0 until 50).map { i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat))
    }
    // planted: vec 200 ≈ vec 3 (tiny perturbation)
    val near = (200L, base(3)._2.map(x => x + 0.001f))
    (base :+ near).toDF("vec_id", "embedding")
  }

  test("embedding near-dup finds the planted close vector") {
    val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 3L && p._2 == 200L))
  }

  test("clusterAssignments: min-label CC over pairs, incl. a deep chain") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round) + island 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterAssignments(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // planted dups in the docs fixture: 0~100 and 5~101 → two 2-clusters
    val real = Dedup.clusterAssignments(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, minJaccard = 0.5, maxShingleDf = 1000))
      .as[(Long, Long)].collect().toMap
    assert(real(100L) == 0L && real(101L) == 5L)
  }

  test("clusterAssignments: pointer jumping converges on a 40-deep chain; capped run fails loudly") {
    // a chain is the worst case for plain HashMin (one hop/round); pointer
    // jumping covers it in ~log2(diameter) rounds
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterAssignments(chain).as[(Long, Long)].collect()
    assert(got.length == 40 && got.forall(_._2 == 0L))
    // an insufficient iteration budget must THROW, never silently return
    // partially-merged clusters (r2 verdict: the silent-wrong-split bug)
    val ex = intercept[IllegalArgumentException] {
      Dedup.clusterAssignments(chain, maxIters = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("leakFreeSplit: cluster members share a split; ratios are sane") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, minJaccard = 0.5, maxShingleDf = 1000)
    val split = Dedup.leakFreeSplit(docs, "doc_id", pairs)
      .as[(Long, Long, String)].collect()
    assert(split.length == docs.count())
    // every cluster maps to exactly one split — no near-dup leakage
    split.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c split across sets")
    }
    // planted dup pairs co-assigned
    val byId = split.map(r => r._1 -> r._3).toMap
    assert(byId(0L) == byId(100L) && byId(5L) == byId(101L))
    assert(split.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("brute-force ANN top-k is exact and deterministic") {
    val q = vecs.filter($"vec_id" === 3L)
    val top = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 3)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(top.head._2 == 200L && top.head._3 > 0.999)
  }

  test("LSH ANN finds the planted neighbor and has useful recall@5") {
    val q = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(vecs, q, "vec_id", "embedding", 5,
      numPlanes = 4, numTables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 = $recall")
    // the planted near-identical vector always collides with its query
    val q3 = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 3L),
      "vec_id", "embedding", 3, numPlanes = 4, numTables = 8)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(q3.headOption.contains(200L))
  }

  test("IVF ANN finds the planted neighbor; full probe = exact top-k") {
    val q = vecs.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 4, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 = $recall")
    // near-identical vectors land in the same inverted list → always found
    val q3 = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 3L),
      "vec_id", "embedding", 3, nlist = 8, nprobe = 2, iters = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(q3.headOption.contains(200L))
    // probing every list degenerates to the exact scan — recall 1
    val full = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", 5,
      nlist = 8, nprobe = 8, iters = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full == exact, "nprobe = nlist must equal brute force")
  }

  test("simhashPairs: recall 1 on all pairs within maxDist, none beyond") {
    // ground truth: driver-side Hamming distances over the actual simhashes
    val sh = Dedup.simhash(docs, "doc_id", "text").as[(Long, Long)].collect()
    val want = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Int)].collect().map(p => (p._1, p._2)).toSet
    assert(got == want, s"banding must find EXACTLY the <=3-distance pairs " +
      s"(missed ${want -- got}, extra ${got -- want})")
  }

  test("simhashPairs maxBucket caps degenerate hash clusters") {
    // 12 identical docs collapse to one simhash → every band bucket holds
    // all 12; a cap below that suppresses the cluster's C(12,2) pairs
    val boiler = (0 until 12).map(i => (i.toLong, "same boilerplate text"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashPairs(boiler, "doc_id", "text", maxDist = 3).count() == 66)
    assert(Dedup.simhashPairs(boiler, "doc_id", "text", maxDist = 3,
      maxBucket = 8).count() == 0)
  }

  test("embedding LSH near-dup pairs: planted pair found, values exact") {
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
      minCos = 0.9, numPlanes = 4, numTables = 8)
      .as[(Long, Long, Double)].collect()
    assert(lsh.exists(p => p._1 == 3L && p._2 == 200L && p._3 > 0.999),
      "the near-identical planted vector must share a bucket with its twin")
    // every LSH pair's cosine must equal the brute-force oracle's value
    val exact = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
      .map(p => ((p._1, p._2), p._3)).toMap
    lsh.foreach { case (a, b, c) =>
      assert(exact.contains((a, b)) && math.abs(exact((a, b)) - c) < 1e-12)
    }
  }

  test("KV converter: merge uses 0x1E/0x1F and extract inverts it") {
    import graft.ops.KvConverter
    val d = Seq((1L, "s1", "p1"), (1L, "s2", "p2"), (2L, "s3", "p3"))
      .toDF("key0", "l1", "l2")
    val kv = KvConverter.mergeLabels(d, "key0", Seq("l1", "l2"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(kv.toSeq == Seq(
      (1L, "s1p1s2p2", 2L),
      (2L, "s3p3", 1L)))
    val back = KvConverter.extractResult(
      KvConverter.mergeLabels(d, "key0", Seq("l1", "l2")), "key0", Seq("l1", "l2"))
      .as[(Long, String, String)].collect().toSet
    assert(back == Set((1L, "s1", "p1"), (1L, "s2", "p2"), (2L, "s3", "p3")))
    assert(KvConverter.extractQuery(d, "key0").as[Long].collect().toSet == Set(1L, 2L))
    // NULL labels must not shift neighbors into the wrong column on
    // extraction (concat_ws silently drops nulls; mergeLabels coerces to "")
    val dn = Seq((1L, null.asInstanceOf[String], "p1"), (2L, "s2", null.asInstanceOf[String]))
      .toDF("key0", "l1", "l2")
    val backN = KvConverter.extractResult(
      KvConverter.mergeLabels(dn, "key0", Seq("l1", "l2")), "key0", Seq("l1", "l2"))
      .as[(Long, String, String)].collect().toSet
    assert(backN == Set((1L, "", "p1"), (2L, "s2", "")))
    // a label CONTAINING a delimiter byte would corrupt the merged value and
    // shift columns on extraction — must fail loudly AT MERGE TIME
    val bad = Seq((1L, "fine", "oops\u001einjected"))
      .toDF("key0", "l1", "l2")
    val ex = intercept[Exception] {
      KvConverter.mergeLabels(bad, "key0", Seq("l1", "l2")).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(ex).contains("delimiter"))
  }

  test("token counts and quality features are sane") {
    val d = Seq((1L, "Hello, world! The quick fox.")).toDF("doc_id", "text")
    val tc = TextAnalysis.tokenCounts(d, "doc_id", "text").collect().head
    assert(tc.getInt(1) == 5)  // ws tokens
    assert(tc.getInt(2) == 8)  // 5 words + 3 punct marks (",", "!", ".")
    val qf = TextAnalysis.qualityFeatures(d, "doc_id", "text").collect().head
    assert(qf.getAs[Int]("n_tokens") == 5)
    assert(qf.getAs[Double]("stopword_ratio") == 0.2) // "the"
    assert(qf.getAs[Double]("punct_ratio") > 0)
  }

  test("language-ID picks the profile with most marker hits") {
    val d = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "el gato y la casa de que el perro y")).toDF("doc_id", "text")
    val m = TextAnalysis.languageId(d, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(m(1L) == "en" && m(2L) == "es")
  }

  test("fingerprints are whitespace-normalization invariant") {
    val d = Seq((1L, "a  b\tc"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(d, "doc_id", "text")
      .select("doc_id", "fingerprint_sha256").as[(Long, String)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("winnowed rolling-hash fingerprints: shared-substring guarantee") {
    val (k, w) = (25, 16)
    val rng = new scala.util.Random(11)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val shared = rand(200) // >= k + w - 1 → must share a fingerprint
    val d = Seq(
      (1L, rand(300) + " " + shared + " " + rand(300)),
      (2L, rand(500) + " " + shared),
      (3L, rand(800))).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(d, "doc_id", "text", k, w)
      .as[(Long, Long, Int)].collect()
    val byDoc = fps.groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "docs sharing a 200-char substring must share a winnowed fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty ||
      (byDoc(1L) intersect byDoc(3L)).size < 2,
      "unrelated random docs should share (almost) nothing")
    // positions are real: recompute each gram's Karp-Rabin hash directly
    val norm1 = TextAnalysis.normalize(
      d.filter($"doc_id" === 1L).head.getString(1))
    fps.filter(_._1 == 1L).take(20).foreach { case (_, fp, pos) =>
      var h = 0L
      norm1.substring(pos, pos + k).foreach(c => h = h * 1000003L + c)
      assert(h == fp, s"fingerprint at pos $pos is not the gram's hash")
    }
  }

  test("winnowed fingerprints are whitespace-normalization invariant") {
    val d = Seq((1L, "alpha beta   gamma\n\ndelta epsilon zeta eta theta iota kappa"),
                (2L, "alpha  beta gamma delta\tepsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(d, "doc_id", "text", k = 10, w = 4)
      .as[(Long, Long, Int)].collect().groupBy(_._1)
      .map { case (id, v) => id -> v.map(r => (r._2, r._3)).toSet }
    assert(fps(1L) == fps(2L))
  }

  test("overlapPairs surfaces the planted partial overlap only") {
    val rng = new scala.util.Random(13)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val shared = rand(300)
    val d = Seq(
      (1L, rand(400) + shared),
      (2L, shared + rand(400)),
      (3L, rand(700)), (4L, rand(700))).toDF("doc_id", "text")
    val pairs = TextAnalysis.overlapPairs(d, "doc_id", "text",
      minShared = 2, maxFpDf = 100)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("multimodal stub plumbing: schema, determinism, batch iteration") {
    val d = Seq((1L, "payload-a", "s"), (2L, "payload-bb", "s"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.synthesizeMedia(d, "doc_id", "text", "source")
    assert(media.schema("bytes").dataType.typeName == "binary")
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1(0).n_bytes == 9 && f1(1).n_bytes == 10)
    assert(f1(0).modality == "audio" && f1(1).modality == "video")
  }

  test("multimodal REAL header decode: PNG IHDR, JPEG SOFn, WAV RIFF chunks") {
    val d = (0L until 9L).map(i => (i, s"src$i")).toDF("doc_id", "source")
    val media = Multimodal.synthesizeMediaReal(d, "doc_id", "source")
    assert(media.schema("bytes").dataType.typeName == "binary")
    val f = Multimodal.extractFeaturesReal(spark, media)
      .collect().sortBy(_.media_id)
    for (r <- f) {
      val id = r.media_id
      (id % 3) match {
        case 0 =>
          assert(r.modality == "png" && r.n_bytes == 45 && r.duration_ms == 0)
          assert(r.width == 64 + (id % 576).toInt && r.height == 64 + (id % 296).toInt)
        case 1 =>
          val samples = (1000 * (1 + id % 30)).toInt
          assert(r.modality == "wav" && r.n_bytes == 44 + 2 * samples)
          assert(r.width == 0 && r.height == 0)
          assert(r.duration_ms == 1000 * (1 + id % 30))
        case _ =>
          assert(r.modality == "jpeg" && r.n_bytes == 17 && r.duration_ms == 0)
          assert(r.width == 64 + (id % 576).toInt && r.height == 64 + (id % 296).toInt)
      }
    }
    // the JPEG parser really SCANS markers (doesn't assume SOF at offset 2):
    // prepend an APP0 segment before SOF0 and it must still find the frame
    val jfif = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0, 4, 0x4a, 0x46) ++
      Multimodal.jpegBytes(100, 50).drop(2)
    val viaApp0 = Multimodal.decodeMedia(
      Multimodal.MediaRow(99L, "jpeg", jfif, "s"))
    assert(viaApp0.width == 100 && viaApp0.height == 50)
    // PNG dimensions are read from IHDR, not synthesized metadata
    val png = Multimodal.decodeMedia(
      Multimodal.MediaRow(98L, "png", Multimodal.pngBytes(1920, 1080), "s"))
    assert(png.width == 1920 && png.height == 1080)
    // torn/unknown containers FAIL loudly instead of decoding as zeros
    intercept[RuntimeException] {
      Multimodal.decodeMedia(Multimodal.MediaRow(97L, "???",
        Array[Byte](1, 2, 3, 4, 5), "s"))
    }
  }
}
