package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance record linkage — joining two tables on NAMES that
  * don't quite match (typos, OCR noise, re-keyed vendor feeds): the
  * EDJoin shape. A naive fuzzy join is |L|·|R| Levenshtein calls;
  * here each probe string is blocked to its `maxDist + 1` RAREST
  * q-grams (rarity = document frequency in the LEFT gram table — the
  * EDJoin frequency-ordered prefix idea), candidates come from the
  * gram equi-join plus a length-band filter, and only candidates pay
  * the exact `levenshtein` verification. Grams that never occur on
  * the left are skipped outright (they cannot generate candidates),
  * which also makes a heavily-typo'd gram self-select out of the
  * prefix.
  *
  * The BLOCKING is part of the operator's contract and is replayed
  * verbatim by the SQL oracle (grams, left-side dfs, the (df, gram)
  * prefix ranking, the band filter, the verify) — so correctness is
  * exact-by-construction, and the blocking's RECALL is quantified
  * separately by the planted-typo gate (`fuzzy_join_recall`), the
  * same honesty split as the MinHash family.
  *
  * Scale shape: one gram-df aggregate over the left (map-side
  * combined), a per-probe window over ~a handful of gram rows, and a
  * candidate equi-join whose fan-out per probe is the df of its
  * rarest grams — small by construction. No all-pairs stage.
  */
object FuzzyJoin {

  /** Distinct q-grams of `name` (full-length except for sub-q names,
    * which contribute their whole text once — same truncation rule as
    * the SQL replay).
    */
  private def grams(name: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(name) - (q - 1), lit(1))),
      i => name.substr(i, lit(q))))

  /** Pairs `(l_id, r_id, dist)` with `levenshtein(l_name, r_name) <=
    * maxDist`, found through the rarest-gram blocking. `left` must
    * have columns `(l_id, l_name)`, `right` `(r_id, r_name)`.
    */
  def editBlockedJoin(
      left: DataFrame,
      right: DataFrame,
      maxDist: Int = 1,
      q: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val lg = left.select(col("l_id"), col("l_name"),
      explode(grams(col("l_name"), q)).as("g"))
    val gdf = lg.groupBy("g").agg(count(lit(1)).as("gdf"))
    val rg = right.select(col("r_id"), col("r_name"),
        explode(grams(col("r_name"), q)).as("g"))
      .join(gdf, Seq("g"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("r_id"))
          .orderBy(col("gdf").asc, col("g").asc)))
      .filter(col("rn") <= maxDist + 1)
      .select("r_id", "r_name", "g")
    val cands = lg.select("l_id", "l_name", "g")
      .join(rg, "g")
      .filter(abs(length(col("l_name")) - length(col("r_name"))) <= maxDist)
      .select("l_id", "l_name", "r_id", "r_name")
      .distinct()
    cands
      .select(col("l_id"), col("r_id"),
        levenshtein(col("l_name"), col("r_name")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
