package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram overlap metrics for (candidate, reference) text pairs
  * — the ROUGE-N accounting an eval/summarization pipeline runs over
  * model outputs, and a curation pipeline runs to audit how much of a
  * rewrite survived. Emits the three EXACT integers (clipped overlap,
  * candidate total, reference total) that precision/recall/F are
  * ratios of, never the float ratios themselves — the engine-neutral
  * convention every oracled query here follows.
  *
  * overlap = Σ_g min(count_cand(g), count_ref(g)) over n-grams g —
  * the standard clipped-count ROUGE-N numerator (also BLEU-n's
  * modified precision numerator with cand/ref swapped), so one
  * operator serves both directions.
  *
  * Scale shape: tokenize each side once, count per (pair_id, gram)
  * with BOTH sides' counts folded in one map-side-combinable
  * aggregate (a side tag per row, conditional sums — no
  * counts-vs-counts join), then one aggregate down to the pair. Grams
  * shuffle as 8-byte xxhash64 keys, not strings (the
  * TextDedup.shinglesHashed convention); counts stay string-exact
  * modulo 64-bit collisions, and the string-replay oracle is the
  * collision audit.
  */
object EvalMetrics {

  private val Sep = " "

  /** Per-pair exact ROUGE-N counts: `(pair_id, overlap_ngrams,
    * cand_ngrams, ref_ngrams)`. `pairs` = `(pair_id, cand_text,
    * ref_text)`; texts are tokenized on the shared normalized form
    * ([[TextDedup.normText]]). A side with fewer than `n` tokens
    * contributes zero n-grams; pairs where BOTH sides are empty still
    * emit (all three counts 0) so the pair universe is preserved.
    */
  def rougeNCounts(pairs: DataFrame, n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1,8], got $n")

    def grams(text: Column): Column = {
      // drop empty tokens up front: split("") yields [""], which would
      // otherwise mint a phantom unigram for empty texts (caught by
      // the model-parity fuzz at n = 1)
      val tk = filter(split(TextDedup.normText(text), " "),
        w => length(w) > 0)
      val win = transform(sequence(lit(1), size(tk) - (n - 1)), i =>
        xxhash64(concat_ws(Sep,
          (0 until n).map(o => element_at(tk, i + o)): _*)))
      when(size(tk) >= n, win).otherwise(array().cast("array<bigint>"))
    }

    val sides = pairs
      .select(col("pair_id"), lit(1).as("is_cand"),
        explode_outer(grams(col("cand_text"))).as("g"))
      .unionByName(pairs
        .select(col("pair_id"), lit(0).as("is_cand"),
          explode_outer(grams(col("ref_text"))).as("g")))
    // explode_outer keeps gram-less sides as a g = NULL row: it holds
    // the pair_id in the universe and contributes 0 to every count
    sides
      .groupBy(col("pair_id"), col("g"))
      .agg(
        sum(when(col("g").isNotNull && col("is_cand") === 1, 1L)
          .otherwise(0L)).as("c_cnt"),
        sum(when(col("g").isNotNull && col("is_cand") === 0, 1L)
          .otherwise(0L)).as("r_cnt"))
      .groupBy(col("pair_id"))
      .agg(
        sum(least(col("c_cnt"), col("r_cnt"))).as("overlap_ngrams"),
        sum(col("c_cnt")).as("cand_ngrams"),
        sum(col("r_cnt")).as("ref_ngrams"))
  }

  /** Inter-rater agreement (Cohen's κ) between two 0/1 raters over
    * the same row universe — the eval-ops screen for "do these two
    * labeling sources agree beyond chance" (human vs model judge, two
    * quality classifiers, annotator pairs). κ = (p_o − p_e)/(1 − p_e);
    * this emits the exact integer pieces it is a ratio of, never the
    * float: with N rows, A = n_agree, and marginal positives a⁺/b⁺,
    *
    *   kappa_num = N·A − (a⁺·b⁺ + (N−a⁺)(N−b⁺))
    *   kappa_den = N² − (a⁺·b⁺ + (N−a⁺)(N−b⁺))
    *
    * Both carry N² terms, which pass int64 around N ≈ 3·10⁹ — well
    * inside a corpus-scale run — so the arithmetic is DECIMAL(38,0)
    * and the two wide values ship as canonical digit STRINGS (the
    * repo's wide-decimal convention; exact out to N ≈ 10¹⁹).
    * `substantial` is the Landis–Koch "moderate or better" verdict
    * κ > 0.4 by cross-multiplication (5·num > 2·den — valid since
    * den > 0 whenever either rater is non-constant).
    *
    * Scale shape: ONE map-side-combined global aggregate over the
    * scan; everything after runs on a 1-row frame.
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val agg = df.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum((a === b).cast("long")).cast("decimal(38,0)").as("n_agree"),
      sum(a.cast("long")).cast("decimal(38,0)").as("a_pos"),
      sum(b.cast("long")).cast("decimal(38,0)").as("b_pos"))
    val chance = col("a_pos") * col("b_pos") +
      (col("n") - col("a_pos")) * (col("n") - col("b_pos"))
    val num = col("n") * col("n_agree") - chance
    val den = col("n") * col("n") - chance
    agg.select(
      col("n").cast("long").as("n"),
      col("n_agree").cast("long").as("n_agree"),
      col("a_pos").cast("long").as("a_pos"),
      col("b_pos").cast("long").as("b_pos"),
      num.cast("string").as("kappa_num"),
      den.cast("string").as("kappa_den"),
      (num * 5 > den * 2).as("substantial"))
  }
}
