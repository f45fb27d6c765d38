package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted shuffle join — the explicit defense when an equi-join key is
  * skewed and the small side is too large to broadcast: a handful of
  * hot keys would otherwise send their entire fan-in to single
  * reducers while the rest of a 1000-executor cluster idles.
  *
  * The big side gets a deterministic per-row salt in `[0, buckets)`;
  * the small side is replicated once per salt value (an `explode` of a
  * `buckets`-element sequence — output grows by |small|×buckets, which
  * is the explicit price and why `buckets` should be sized to the skew,
  * not maxed out). The join key becomes `(key, salt)`, so a hot key's
  * rows spread over `buckets` reducers. Row-for-row identical to the
  * plain inner equi-join: each big-side row matches exactly the
  * replica carrying its own salt.
  *
  * This is the manual form of what AQE's `skewJoin` rewrite does
  * adaptively (splitting oversized partitions post-shuffle). The
  * explicit version still matters at scale: AQE can only split what
  * one map output produced, while salting prevents the hot partition
  * from ever forming — and it works under static planning (streaming,
  * cached exchanges) where AQE does not apply.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted into
    * `buckets` sub-keys. `salt` must be a deterministic per-row column
    * on the big side (e.g. `xxhash64(col("id"))`); it is reduced
    * `pmod buckets` internally, and a NULL-evaluating salt falls back
    * to bucket 0 — a NULL sub-key would silently drop the row from the
    * inner join, breaking row-parity with the plain join.
    */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    val saltedBig = big.withColumn(
      "__salt", coalesce(pmod(salt, lit(buckets)).cast("int"), lit(0)))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
