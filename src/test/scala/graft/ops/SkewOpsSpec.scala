package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join and two-pass heavy hitters must be result-identical to
  * their naive formulations — the whole point is changing the plan
  * shape, never the answer.
  */
class SkewOpsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("saltedInnerJoin == plain inner join, including dim duplicates") {
    // skewed big side: 90% of rows on one key
    val big = spark.range(1000)
      .select(col("id"),
        when(col("id") % 10 === 0, lit("cold")).otherwise(lit("hot"))
          .as("k"))
    // dim with a DUPLICATE key row: join multiplicity must be preserved
    val dim = Seq(("hot", 1L), ("cold", 2L), ("cold", 3L))
      .toDF("k", "weight")
    val salted = SkewJoin.saltedInnerJoin(
      big, dim, "k", salt = xxhash64(col("id")), buckets = 8)
      .select("id", "k", "weight")
    val plain = big.join(dim, "k").select("id", "k", "weight")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("exactHeavyHitters == GROUP BY HAVING") {
    // zipf-ish: key k appears ~1000/k times
    val df = spark.range(1, 3000)
      .select((lit(3000) / col("id")).cast("long").as("k"))
    val hh = HeavyHitters.exactHeavyHitters(df, "k", minCount = 50L,
      support = 0.01)
      .as[(Long, Long)].collect().toMap
    val naive = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 50L)
      .as[(Long, Long)].collect().toMap
    assert(hh == naive && naive.nonEmpty)
  }

  test("NULL keys form a HAVING group in both heavy-hitter variants") {
    val df = spark.range(200)
      .select(when(col("id") < 120, lit(null).cast("string"))
        .when(col("id") < 190, lit("hot"))
        .otherwise(concat(lit("u"), col("id"))).as("k"))
    val expect = Map((null: String) -> 120L, "hot" -> 70L)
    val a = HeavyHitters.exactHeavyHitters(df, "k", minCount = 50L,
      support = 0.01).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = HeavyHitters.exactHeavyHittersMG(df, "k", minCount = 50L,
      k = 64).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == expect, a.toString)
    assert(b == expect, b.toString)
  }

  test("NULL salt rows survive the salted join") {
    val big = spark.range(100)
      .select(col("id"), lit("k1").as("k"),
        when(col("id") % 5 === 0, lit(null).cast("long"))
          .otherwise(col("id")).as("saltSrc"))
    val dim = Seq(("k1", 7L)).toDF("k", "w")
    val joined = SkewJoin.saltedInnerJoin(big, dim, "k",
      salt = col("saltSrc"), buckets = 8)
    assert(joined.count() == 100L)
  }

  test("Auto variants derive sound bounds from the actual row count") {
    val df = spark.range(1, 3000)
      .select((lit(3000) / col("id")).cast("long").as("k"))
    val naive = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 50L)
      .as[(Long, Long)].collect().toMap
    val a = HeavyHitters.exactHeavyHittersAuto(df, "k", minCount = 50L)
      .as[(Long, Long)].collect().toMap
    val b = HeavyHitters.exactHeavyHittersMGAuto(df, "k", minCount = 50L)
      .as[(Long, Long)].collect().toMap
    assert(a == naive && b == naive && naive.nonEmpty)
    // beyond the freqItems support floor (minCount/N < 1e-4) the
    // router must fall over to the fully distributed Misra-Gries path
    // instead of throwing — same exact GROUP BY HAVING result
    val big = spark.range(200000).select((col("id") % 100000).as("k"))
    val viaRouter = HeavyHitters.exactHeavyHittersAuto(big, "k",
      minCount = 2L).as[(Long, Long)].collect().toMap
    val bigNaive = big.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2L).as[(Long, Long)].collect().toMap
    assert(viaRouter == bigNaive && bigNaive.size == 100000)
    // MGAuto with an explicit memory cap still refuses an unsound k
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHittersMGAuto(big, "k", minCount = 2L,
        maxK = 1024)
    }
    // the router enforces the SAME cap on its MG branch — a bound the
    // no-miss guarantee would push past maxK throws instead of
    // silently clamping (ADVICE r10)
    val routerErr = intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHittersAuto(big, "k", minCount = 2L,
        maxK = 1024)
    }
    assert(routerErr.getMessage.contains("maxK"))
  }

  test("Auto router picks MG above the candidate-bound threshold") {
    // N/minCount = 2950/25 = 119 candidates: freqItems territory below
    // a 200 threshold, MG territory above — both must agree with the
    // naive GROUP BY HAVING
    val df = spark.range(1, 3000)
      .select((lit(3000) / col("id")).cast("long").as("k"))
    val naive = df.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 25L).as[(Long, Long)].collect().toMap
    val viaFreq = HeavyHitters.exactHeavyHittersAuto(df, "k",
      minCount = 25L, mgThreshold = 200).as[(Long, Long)].collect().toMap
    val viaMg = HeavyHitters.exactHeavyHittersAuto(df, "k",
      minCount = 25L, mgThreshold = 16).as[(Long, Long)].collect().toMap
    assert(viaFreq == naive && viaMg == naive && naive.nonEmpty)
  }

  test("exactHeavyHitters returns the contract schema when nothing qualifies") {
    val df = spark.range(100).select(col("id").as("k")) // all unique
    val out = HeavyHitters.exactHeavyHitters(df, "k", minCount = 5L,
      support = 0.04)
    assert(out.columns.toSeq == Seq("k", "cnt"))
    assert(out.count() == 0L)
  }
}
