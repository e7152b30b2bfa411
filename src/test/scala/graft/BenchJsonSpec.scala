package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a bounded TAIL of bench stdout (2000 chars in
  * round 4) — the final line must parse as JSON from inside that window.
  * These tests pin the compact-line contract without running a bench.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val idx =
    """{"docs":480000,"postings":125000000,"filesPerSec":21305.4,""" +
      """"postingsPerSec":5810000,"terms":52000,"segments":4096}"""
  private val scalingCompact =
    """{"cores2Sec":108.38,"lowCpus":8,"highCpus":32,"scaleDocs":480000,""" +
      """"buildSecLow":33.03,"buildSecHigh":21.47,"filesPerSec2":4429.0,""" +
      """"filesPerSecLow":14530.5,"filesPerSecHigh":22353.7,""" +
      """"eff_2_to_8":0.820,"eff_8_to_32":0.385,"eff_median_8_to_32":0.409,""" +
      """"eff_paired_8_to_32":0.386,"eff_median_2_to_8":0.807,""" +
      """"eff_paired_2_to_8":0.832,"repsPerLevel":8,"diagReps":2,""" +
      """"minConfirmed":true,"minsMonotonic":true,"budgetExtended":false,""" +
      """"detail":"BENCH.json"}"""

  // the round-4 bench's real key set (51 entries, ~1180 chars as JSON) —
  // the shape the compact line must carry without dropping anything
  private val realisticKeys = Seq(
    "index_build_fast", "bm25_qset_p50", "bm25_qset_p95", "bm25_batch_qset",
    "bm25_or_p50", "bm25_or_p95", "bm25_filtered_p50", "bm25_filtered_p95",
    "bm25_prefix_p50", "bm25_fuzzy_p50", "bm25_regex_p50", "bm25_not_p50",
    "bm25_bool_p50", "bm25_bool_p95", "bm25_boost_p50", "bm25_page_p50",
    "bm25_page_after_p50", "bm25_count_p50", "bm25_explain", "bm25_mlt",
    "bm25_suggest", "bm25_snippets", "bm25_wildcard_p50", "bm25_dismax_p50",
    "bm25_facet_range_p50", "bm25_facet_stats_p50", "index_build_positional",
    "bm25_phrase_p50", "bm25_phrase3_p50", "bm25_near_p50",
    "bm25_bool_phrase_p50", "bm25_near_ordered_p50", "q1_agg", "q_scan_project",
    "q_join_inner_dup", "q_join_left_pad", "q_membership_filter", "q_topk",
    "q_window_rank", "q_sessionize", "q_dedup_exact_stats", "q_dedup_minhash_lsh",
    "q_dedup_ngram", "q_dedup_simhash", "q_ann_topk", "q_ann_ivf", "q_ann_lsh",
    "q_token_counts", "q_text_quality", "q_lang_id", "q_fingerprint")
  private def pairs(keys: Seq[String]): Seq[(String, Double)] =
    keys.zipWithIndex.map { case (k, i) => k -> i * 0.137 }

  test("the real 51-query key set fits the driver tail window, nothing omitted") {
    val line = Bench.compactLine(42.123, pairs(realisticKeys),
      "/root/testdata/sf0.1", idx, scalingCompact)
    assert(line.length <= Bench.CompactLineMax, s"len=${line.length}")
    assert(!line.contains("_omitted"))
    assert(line.contains(""""bm25_near_ordered_p50""""))
    assert(line.contains(""""eff_2_to_8":0.820"""))
  }

  test("an oversize query map packs greedily and counts the dropped tail") {
    val big = pairs((0 until 200).map(i => f"q_mode_with_a_long_name_$i%03d"))
    val line = Bench.compactLine(42.123, big, "/root/testdata/sf0.1",
      idx, scalingCompact)
    assert(line.length <= Bench.CompactLineMax, s"len=${line.length}")
    // leading entries survive in order; the tail is counted, not silently lost
    assert(line.contains(""""q_mode_with_a_long_name_000":0.00"""))
    val om = """"_omitted":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
    assert(om.exists(n => n > 0 && n < 200))
    // scaling record (the north-rule evidence) survives the degradation
    assert(line.contains(""""minConfirmed":true"""))
  }

  test("compact line is structurally valid JSON (balanced, quoted keys)") {
    val line = Bench.compactLine(1.0, pairs(realisticKeys.take(5)), "sf",
      idx, scalingCompact)
    // cheap structural check without a JSON lib on the test classpath:
    // braces balance and the line starts/ends as one object
    assert(line.head == '{' && line.last == '}')
    val depth = line.foldLeft((0, false)) { case ((d, inStr), c) =>
      c match {
        case '"' => (d, !inStr)
        case '{' if !inStr => (d + 1, inStr)
        case '}' if !inStr => (d - 1, inStr)
        case _ => (d, inStr)
      }
    }
    assert(depth == ((0, false)))
  }
}
