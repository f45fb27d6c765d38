package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the DECIMAL-promoted integer-product-to-double convention that
  * `collocationsTopK` (PMI ratio) and `Association.pairRules` (lift)
  * ride: past 2^53 a `long·long → double` pipeline silently drifts
  * (each long narrows to double BEFORE the multiply), and past 2^63
  * the long multiply itself overflows — while
  * `(a.cast(decimal(38,0)) · b).cast(double)` stays the ONE correctly
  * rounded IEEE double of the exact product at any corpus scale
  * (DuckDB replays it via HUGEINT). VERDICT r15 "What's wrong #4".
  */
class WideProductSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("decimal product rounds correctly past 2^53 where the naive " +
      "double product drifts") {
    // a = 2^53 + 1 is the first long a double cannot hold; ·3 makes
    // the drift visible (naive loses the +1 before multiplying)
    val a = 9007199254740993L
    val got = Seq((a, 3L)).toDF("a", "b").select(
      (col("a").cast("decimal(38,0)") * col("b")).cast("double")
        .as("promoted"),
      (col("a").cast("double") * col("b").cast("double")).as("naive"))
      .head()
    val exact = (BigDecimal(a) * 3).toDouble // correctly rounded
    assert(got.getDouble(0) == exact)
    assert(got.getDouble(1) != exact,
      "the naive path was expected to drift at this magnitude")
  }

  test("decimal product survives past 2^63 where a long multiply " +
      "would overflow") {
    val (a, b) = (4000000000L, 5000000000L) // product 2e19 > Long.Max
    val got = Seq((a, b)).toDF("a", "b")
      .select((col("a").cast("decimal(38,0)") * col("b")).cast("double"))
      .head().getDouble(0)
    assert(got == (BigDecimal(a) * BigDecimal(b)).toDouble)
  }

  test("the full PMI-ratio shape replays against a BigDecimal reference " +
      "on >2^53 counts") {
    // pair_cnt·n_tok and c_l·c_r both past 2^53: the ratio must equal
    // the division of the two correctly rounded exact products
    val (pc, n, cl, cr) = (3L, 9007199254740993L, 7L, 6004799503160661L)
    val got = Seq((pc, n, cl, cr)).toDF("pc", "n", "cl", "cr")
      .select(((col("pc").cast("decimal(38,0)") * col("n"))
        .cast("double") /
        (col("cl").cast("decimal(38,0)") * col("cr")).cast("double"))
        .as("ratio"))
      .head().getDouble(0)
    val expected = (BigDecimal(pc) * BigDecimal(n)).toDouble /
      (BigDecimal(cl) * BigDecimal(cr)).toDouble
    assert(got == expected)
  }
}
