package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alignment-data preparation — the pairwise-preference construction
  * step of an RLHF/DPO pipeline: given many scored candidate responses
  * per prompt, emit one (chosen, rejected) pair per prompt under a
  * margin gate. (Reference analog: the "derive a verdict column, then
  * act on it" shape of the cleanse→classify chain at
  * `extractors.py:151` — here the verdict is a per-group argmax/argmin
  * instead of a per-row predicate.)
  *
  * Determinism contract: chosen = highest score, ties to the SMALLEST
  * response id; rejected = lowest score, ties to the LARGEST response
  * id (the two ends of one (score, -id) ordering, so a fully tied
  * group still yields a well-defined — margin-0, hence gated — pair).
  * Everything is exact integer arithmetic and replays engine-to-engine.
  *
  * Scale shape: ONE map-side-combinable aggregate over the prompt
  * grouping — both extremes ride a single struct-max/min pair, so a
  * 10^9-prompt corpus costs one shuffle of (prompt_id, 4 longs) and
  * no windows, no self-joins, no per-prompt sorts.
  */
object Alignment {

  /** One preference pair per prompt with at least `minMargin` score
    * separation: `(prompt_id, chosen_id, rejected_id, margin,
    * n_candidates)`. `responses` = `(prompt_id, response_id, score)`,
    * ids unique within a prompt, all integral. Prompts with fewer
    * than two candidates never emit (there is nothing to contrast).
    */
  def preferencePairs(responses: DataFrame, minMargin: Long): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    responses
      .groupBy(col("prompt_id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        // lexicographic extremes of (score, -id): max = top score with
        // the smallest id, min = bottom score with the largest id
        max(struct(col("score").as("s"), (-col("response_id")).as("neg")))
          .as("best"),
        min(struct(col("score").as("s"), (-col("response_id")).as("neg")))
          .as("worst"))
      .filter(col("n_candidates") >= 2 &&
        col("best.s") - col("worst.s") >= minMargin)
      .select(
        col("prompt_id"),
        (-col("best.neg")).as("chosen_id"),
        (-col("worst.neg")).as("rejected_id"),
        (col("best.s") - col("worst.s")).as("margin"),
        col("n_candidates"))
  }
}
