package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The first rounds of BPE tokenizer training — "which merges would a
  * tokenizer trained on THIS corpus learn first": per round, the most
  * frequent adjacent symbol pair across all word occurrences, applied
  * (leftmost non-overlapping, the shared `replace` convention) before
  * the next round recounts.
  *
  * Scale shape: the corpus is tokenized ONCE into a (word, count)
  * vocabulary — the classic BPE-trainer move; everything after runs on
  * the vocabulary, which is heavy-tailed but bounded (a Zipf corpus at
  * 100 TB still has ~10⁷ distinct words). Merged symbols are carried
  * as single private-use placeholder characters, so pair extraction
  * stays a per-character slice every round; placeholders expand back
  * to their text in the output via a chain of 1-row broadcast joins.
  */
object BpeMiner {

  /** Placeholder characters for merged symbols — control-plane
    * codepoints that cannot appear in normalized corpus text.
    */
  private val Placeholders = Seq("\u0001", "\u0002", "\u0003", "\u0004")

  /** One row per merge round: `(merge_rank, left_sym, right_sym,
    * pair_cnt)` with placeholder symbols expanded to their full text.
    */
  def topMerges(docs: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= Placeholders.size,
      s"rounds must be in [1, ${Placeholders.size}], got $rounds")
    // the one corpus pass: normalized whitespace tokens → vocabulary
    val vocab = docs.filter(col("text").isNotNull)
      .select(explode(split(TextDedup.normText(col("text")), " "))
        .as("w"))
      .filter(length(col("w")) > 1)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()

    val pairStructs = expr(
      "transform(sequence(1, length(w) - 1), " +
        "i -> struct(substring(w, i, 1) AS l, " +
        "substring(w, i + 1, 1) AS r))")

    var cur = vocab
    var tops = List.empty[DataFrame] // newest first, raw (unexpanded)
    for (r <- 0 until rounds) {
      // length-1 words (fully merged symbols) must not reach the
      // sequence(): Spark's sequence(1, 0) generates DESCENDING [1,0]
      // rather than empty, minting phantom ("", sym) pairs
      val top = cur
        .filter(length(col("w")) > 1)
        .select(col("cnt"), explode(pairStructs).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint()
      tops ::= top
      if (r + 1 < rounds) {
        cur = cur
          .crossJoin(broadcast(
            top.select(col("l").as("__l"), col("r").as("__r"))))
          .withColumn("w",
            replace(col("w"), concat(col("__l"), col("__r")),
              lit(Placeholders(r))))
          .drop("__l", "__r")
      }
    }
    val ordered = tops.reverse
    // expand placeholders newest-first: placeholder i's expansion may
    // itself contain earlier placeholders, which the later replaces fix
    val out = ordered.zipWithIndex.map { case (top, idx) =>
      val withPrior = ordered.take(idx).zipWithIndex
        .foldLeft(top.select(col("l"), col("r"), col("pair_cnt"))) {
          case (acc, (prior, j)) =>
            acc.crossJoin(broadcast(prior.select(
              col("l").as(s"__pl$j"), col("r").as(s"__pr$j"))))
        }
      val expand = (c: org.apache.spark.sql.Column) =>
        (idx - 1 to 0 by -1).foldLeft(c) { (acc, j) =>
          replace(acc, lit(Placeholders(j)),
            concat(col(s"__pl$j"), col(s"__pr$j")))
        }
      withPrior.select(
        lit(idx + 1L).as("merge_rank"),
        expand(col("l")).as("left_sym"),
        expand(col("r")).as("right_sym"),
        col("pair_cnt"))
    }
    out.reduce(_.unionByName(_)).orderBy("merge_rank")
  }
}
