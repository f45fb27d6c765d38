package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling" — public method):
  * score every source document by how much more likely its hashed
  * n-gram bag is under a TARGET distribution (the clean/domain corpus
  * you want more of) than under the source distribution it came from.
  * Pretraining pipelines rank a raw crawl by this weight and resample
  * the top slice toward the target domain.
  *
  * Integer-exact formulation (this repo's surprisal idiom): per gram
  * occurrence the importance contribution is
  * `bits_source − bits_target` where `bits_X` = `length(bin(total_X
  * div count_X(bucket)))` — the integer bit-length of the inverse
  * bucket probability, exactly [[TextAnalysis.bigramSurprisal]]'s
  * integer log2. Buckets a target corpus never hit cost a flat
  * `oovBits` (the [[TextAnalysis]] reference-LM convention), so
  * off-domain grams push the score down hard. Positive score = more
  * target-like than the source average; every value replays
  * engine-to-engine with no floats anywhere.
  *
  * The hashed feature space is an md5 HEX PREFIX of the gram
  * (`bucketHexLen` chars → 16^len buckets) — DSIR's hashed
  * bag-of-ngrams with a hash both engines compute identically, so
  * even the bucketing is oracle-replayable (the stratified-sample
  * md5-threshold convention on the feature axis).
  *
  * Scale shape: the two bucket-count tables are FEATURE-space-sized
  * (16^len rows — 256 at the default), built by map-side-combinable
  * aggregates and broadcast back; the per-document score is one
  * explode → broadcast-join → groupBy(doc_id) chain. Nothing joins
  * corpus-to-corpus and nothing is vocabulary-wide beyond the fixed
  * bucket table, so a 100 TB crawl pays one tokenize scan per side
  * plus one doc-keyed aggregate.
  */
object Dsir {

  /** `(doc_id, n_grams, score_bits)` for every source document with at
    * least one gram. `source` and `target` are corpus frames with
    * `doc_id`/`text`; grams are whitespace unigrams of the shared
    * normalized form.
    */
  def importanceBits(
      source: DataFrame,
      target: DataFrame,
      bucketHexLen: Int = 2,
      oovBits: Int = 20): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 8,
      s"bucketHexLen must be in [1,8], got $bucketHexLen")
    require(oovBits >= 1, s"oovBits must be >= 1, got $oovBits")

    def grams(df: DataFrame): DataFrame = df
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(filter(split(TextDedup.normText(col("text")), " "),
          w => length(w) > 0)).as("w"))
      .select(col("doc_id"),
        substring(md5(col("w")), 1, bucketHexLen).as("bk"))

    val src = grams(source)
    val srcCnt = src.groupBy(col("bk")).agg(count(lit(1)).as("s_cnt"))
    val srcTot = srcCnt.agg(sum(col("s_cnt")).as("s_tot"))
    val tgtCnt = grams(target).groupBy(col("bk"))
      .agg(count(lit(1)).as("t_cnt"))
    val tgtTot = tgtCnt.agg(sum(col("t_cnt")).as("t_tot"))

    src
      .join(broadcast(srcCnt), Seq("bk"))
      .join(broadcast(tgtCnt), Seq("bk"), "left")
      .crossJoin(broadcast(srcTot))
      .crossJoin(broadcast(tgtTot))
      .select(col("doc_id"),
        (length(bin(expr("s_tot div s_cnt"))) -
          when(col("t_cnt").isNull, lit(oovBits))
            .otherwise(length(bin(expr("t_tot div t_cnt")))))
          .cast("long").as("d_bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(col("d_bits")).as("score_bits"))
  }
}
