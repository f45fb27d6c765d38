package graft

import graft.SparkSpec

/** Registry-wide plan invariants: EVERY registered query must plan
  * without the operators that do not survive a 100× scale-up.
  *
  *  - `CartesianProduct` (a non-broadcast all-pairs product) may appear
  *    nowhere: every candidate-pair operator is required to bucket or
  *    broadcast first.
  *  - `BroadcastNestedLoopJoin` is the intentional shape ONLY for the
  *    brute-force ANN baselines and IVF centroid assignment, where one
  *    side is a deliberately tiny broadcast set (query vectors /
  *    centroids) — everywhere else it flags a join that lost its equi
  *    condition.
  *
  * Plans are built at sf0.001: plan SHAPE does not depend on the scale
  * factor (AQE may later replace exchanges, but a cartesian product
  * never becomes an equi-join at runtime).
  */
class PlanInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose broadcast nested-loop join is the designed plan. */
  private val bnljByDesign = Set(
    "ann_cosine_topk", // brute-force baseline: corpus × broadcast(queries)
    "hard_negatives",  // same brute shape, label-mismatch filter
    "ann_quantized_topk", // same brute-force shape on int8 codes
    "pq_codes",        // corpus × broadcast(one packed codebook row)
    "ann_pq_topk",     // PQ encode + broadcast(queries) ADC scoring
    "ann_ivf_topk",    // corpus × broadcast(centroids) assignment
    "ann_ivfpq_topk",  // IVF assignment + broadcast packed codebook/probes
    "ann_ivfpq_recall", // same fused pipeline under the planted-recall flag
    "ann_ivfpq_adc_recall", // k-means assignment + 1-row hit-count joins
    "ann_ivfsq8_topk", // corpus × broadcast(centroids) assignment
    "triangle_count",  // × broadcast(1-row count aggregates)
    "sketch_hll_intersect", // × broadcast(1-row sketch + exact-count rows)
    "sketch_kmv_diff", // × broadcast(1-row estimate/common/exact rows)
    "source_ablation", // × broadcast(1-row grand-total complement base)
    "collocations_topk", // × broadcast(1-row token total)
    "bpe_merges",      // × broadcast(1-row per-round top merge)
    "bpe_compression", // same chain, one more 1-row apply + 1-row ratio
    "bpe_merge_curve", // per-round 1-row recounts × the 1-row w0 total
    "bpe_encode",      // same 1-row merge broadcasts feeding the encode
    "bpe_pack",        // same chain driving the encoded-length packing
    "bpe_fertility",   // same chain feeding the per-language sums
    "dsir_importance", // × broadcast(1-row source/target gram totals)
    "dsir_select",     // same chain under the keep filter
    "join_blowup_audit", // × broadcast(1-row blowup totals)
    "kn_continuation", // × broadcast(1-row bigram-type total)
    "basket_pairs",    // × broadcast(1-row order total)
    "mutual_top_match", // brute baseline: left × broadcast(right)
    "cosine_neardup_pairs",
    "ann_planted_recall", // IVF × broadcast(centroids) + 1-row flag join
    "ann_matryoshka_recall", // head scan × broadcast(planted queries)
    "sketch_cms_merge", // × broadcast(1-row total + merge-audit flags)
    "kmeans_assign",   // corpus × broadcast(one packed 8-centroid row)
    "semdedup_e2e",    // same k-means assignment feeding the dedup
    "semdedup_keep_e2e", // its applied survivors-only form
    "quantile_filter",  // × broadcast(single-row percentile cutoff)
    "bm25_topk",        // × broadcast(single-row N/avgdl scalars)
    "hybrid_rrf_topk",  // BM25 scalars + brute-ANN broadcast(queries)
    "tfidf_top_terms",  // × broadcast(single-row corpus doc count)
    "unigram_surprisal", // × broadcast(single-row corpus token total)
    "quality_blend",   // × broadcast(1-row percentile cutoffs + totals)
    "maxsim_topk",     // doc tokens × broadcast(16 query token vectors)
    "maxsim_rerank_recall", // same + lead-token × broadcast(4 queries)
    "retrieval_eval",  // BM25 scalars 1-row broadcast (bm25_topk shape)
    "split_leakage_audit", // × broadcast(two 1-row leak aggregates)
    "vocab_growth",    // × broadcast(1-row id-range frame)
    "kn_perplexity",   // × broadcast(1-row bigram-type total)
    "corpus_inequality", // × broadcast(1-row language-HHI frame)
    "graded_rank_eval", // BM25 scalars 1-row broadcast (bm25_topk shape)
    "pareto_frontier", // × broadcast(1-row x-range scalar for bucketing)
    "benford_audit",   // × broadcast(1-row audited-total scalar)
    "graph_reciprocity", // × broadcast(1-row self-loop count)
    "mm_image_neardup", // recall 1-row × broadcast(1-row fp count)
    "mm_audio_neardup", // same plantedRecallFp two-aggregate shape
    "mm_video_neardup") // same shape, third modality

  test("no registered query plans a CartesianProduct; BNLJ only by design") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.executedPlan.toString
          catch {
            case e: Throwable =>
              fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
          }
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !bnljByDesign.contains(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
