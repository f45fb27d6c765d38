package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Independent reference model of [[Sampling.systematicByWeight]]'s
  * two-tier PPS design, written directly from the math (BigInt, plain
  * sorts — no Spark, no SQL) so the generative properties below and the
  * Spark-parity test in CurationOpsSpec triangulate the distributed
  * implementation: properties pin the MODEL's contract, parity pins
  * Spark == model.
  */
object SystematicModel {

  /** Selected ids for one group of (id, weight) rows. */
  def select(rows: Seq[(Long, Long)], k: Int): Set[Long] = {
    val pos = rows.filter(_._2 > 0)
    if (pos.isEmpty) return Set.empty
    // certainty prefix on the weight-desc axis
    val desc = pos.sortBy { case (id, w) => (-w, id) }
    val suffix = desc.map(r => BigInt(r._2)).scanRight(BigInt(0))(_ + _)
    val cert = desc.zipWithIndex.takeWhile { case ((_, w), i) =>
      BigInt(w) * (k - i) >= suffix(i)
    }.map(_._1._1).toSet
    // fixed-step systematic over the residual, in id order
    val resid = pos.filterNot(r => cert(r._1)).sortBy(_._1)
    val kk = BigInt(k - cert.size)
    val tot = resid.map(r => BigInt(r._2)).sum
    if (tot <= 0 || kk <= 0) return cert
    var cum = BigInt(0)
    val picked = resid.flatMap { case (id, w) =>
      cum += w
      if (cum * kk / tot > (cum - w) * kk / tot) Some(id) else None
    }
    cert ++ picked
  }
}

/** ScalaCheck properties for the curation samplers (the class of bug
  * CurationOpsSpec caught once by example — heavy-weight stride
  * collapse — kept caught generatively).
  */
object SamplingProps extends Properties("graft.sampling") {

  private val groupGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    ws <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(1L, 1000L),
      2 -> Gen.choose(1L, 50_000_000L))) // heavy-tail skew
  } yield ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }

  private val kGen: Gen[Int] = Gen.choose(1, 50)

  property("exactly min(n, k) rows per group — even under skew") =
    forAll(groupGen, kGen) { (rows, k) =>
      val got = SystematicModel.select(rows, k).size
      got == math.min(rows.count(_._2 > 0), k)
    }

  property("a row holding >= 1/k of the total weight is always kept") =
    forAll(groupGen.suchThat(_.nonEmpty), kGen) { (rows, k) =>
      val tot = rows.map(r => BigInt(r._2)).sum
      val sel = SystematicModel.select(rows, k)
      rows.filter(r => BigInt(r._2) * k >= tot && r._2 > 0)
        .forall(r => sel(r._1))
    }

  property("input order is irrelevant (content-determined selection)") =
    forAll(groupGen, kGen) { (rows, k) =>
      SystematicModel.select(rows, k) ==
        SystematicModel.select(rows.reverse, k)
    }

  property("zero/negative weights are never selected") =
    forAll(groupGen, kGen) { (rows, k) =>
      val tainted = rows ++ List((9999L, 0L), (9998L, -5L))
      val sel = SystematicModel.select(tainted, k)
      !sel(9999L) && !sel(9998L)
    }

  property("uniform weights degrade to plain systematic: every pick gap" +
    " is n/k +- 1") =
    forAll(Gen.choose(1, 40), Gen.zip(Gen.choose(50, 200), Gen.choose(1L, 99L))) {
      case (k, (n, w)) =>
        val rows = (0 until n).map(i => (i.toLong, w))
        val picks = SystematicModel.select(rows, k).toSeq.sorted
        val gaps = picks.zip(picks.tail).map { case (a, b) => b - a }
        val stride = n.toDouble / k
        picks.size == math.min(n, k) &&
          gaps.forall(g => g >= stride.floor - 1 && g <= stride.ceil + 1)
    }

  // ------------------------------------------- deterministic Bernoulli

  private def hexBucket(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).take(2)
      .map(b => f"${b & 0xff}%02x").mkString
  }

  property("thresholdHex keep-decision is monotone in the rate") =
    forAll(Gen.asciiPrintableStr, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (s, r1, r2) =>
        val (lo, hi) = if (r1 < r2) (r1, r2) else (r2, r1)
        val b = hexBucket(s)
        // kept at lo => kept at hi (sample nesting, the train/eval
        // stability property)
        !(b < Sampling.thresholdHex(lo)) || b < Sampling.thresholdHex(hi)
    }

  property("thresholdHex rate accuracy: keep fraction within 5 sd") =
    forAll(Gen.choose(0.05, 0.95), Gen.choose(0L, 1000000L)) { (rate, salt) =>
      val n = 2000
      val t = Sampling.thresholdHex(rate)
      val kept = (0 until n).count(i => hexBucket(s"doc-$salt-$i") < t)
      val sd = math.sqrt(n * rate * (1 - rate))
      math.abs(kept - n * rate) < 5 * sd
    }
}
