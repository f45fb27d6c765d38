package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Independent reference model of [[Mixture.waterfill]] — the
  * SEQUENTIAL water-filling definition (process groups capacity-
  * ascending; a group is capped iff its capacity fits the fair share
  * of the budget still unallocated, and the first failure uncaps all
  * the rest), written without the prefix-count shortcut the Spark
  * plan uses, so the generative properties below and the parity test
  * in ProfilingSpec triangulate the implementation.
  */
object WaterfillModel {

  /** key → (alloc, capped). */
  def allocate(
      caps: Seq[(String, Long)],
      numer: Long,
      denom: Long): Map[String, (Long, Boolean)] = {
    val sorted = caps.sortBy { case (k, c) => (c, k) }
    val n = sorted.size
    val budget = sorted.map(_._2).sum * numer / denom
    var remaining = budget
    var uncapped = List.empty[(String, Long)]
    var out = Map.empty[String, (Long, Boolean)]
    var broke = false
    sorted.zipWithIndex.foreach { case ((key, c), i) =>
      val m = n - i
      if (!broke && c * m <= remaining) {
        out += key -> ((c, true)); remaining -= c
      } else {
        broke = true; uncapped ::= (key, c)
      }
    }
    val unc = uncapped.reverse
    val m = unc.size
    if (m > 0) {
      val base = remaining / m
      val rem = remaining % m
      unc.zipWithIndex.foreach { case ((key, _), j) =>
        out += key -> ((base + (if (j < rem) 1L else 0L), false))
      }
    }
    out
  }
}

/** Generative invariants of the water-filling allocator. */
object MixtureProps extends Properties("Waterfill") {

  private val genCaps: Gen[Seq[(String, Long)]] = for {
    n <- Gen.choose(1, 20)
    caps <- Gen.listOfN(n, Gen.choose(0L, 1000L))
  } yield caps.zipWithIndex.map { case (c, i) => (s"g$i", c) }

  private val genFrac: Gen[(Long, Long)] = for {
    denom <- Gen.choose(1L, 10L)
    numer <- Gen.choose(0L, denom)
  } yield (numer, denom)

  property("conservation: Σalloc == min(budget, Σcap)") =
    forAll(genCaps, genFrac) { case (caps, (nu, de)) =>
      val total = caps.map(_._2).sum
      val budget = total * nu / de
      val got = WaterfillModel.allocate(caps, nu, de)
      got.values.map(_._1).sum == math.min(budget, total)
    }

  property("bounds: 0 <= alloc <= cap; capped groups take it all") =
    forAll(genCaps, genFrac) { case (caps, (nu, de)) =>
      val got = WaterfillModel.allocate(caps, nu, de)
      caps.forall { case (k, c) =>
        val (a, capped) = got(k)
        a >= 0 && a <= c && (!capped || a == c)
      }
    }

  property("fairness: uncapped allocations differ by at most 1") =
    forAll(genCaps, genFrac) { case (caps, (nu, de)) =>
      val unc = WaterfillModel.allocate(caps, nu, de)
        .values.collect { case (a, false) => a }
      unc.isEmpty || unc.max - unc.min <= 1
    }

  property("no uncapped group ends below a capped group's take") =
    forAll(genCaps, genFrac) { case (caps, (nu, de)) =>
      // the water level is at least the largest capped capacity:
      // everything smaller drowned (took its full cap) first
      val got = WaterfillModel.allocate(caps, nu, de)
      val cappedTakes = got.values.collect { case (a, true) => a }
      val unc = got.values.collect { case (a, false) => a }
      cappedTakes.isEmpty || unc.isEmpty ||
        unc.min >= cappedTakes.max
    }

  property("budget monotone: more budget never shrinks an allocation") =
    forAll(genCaps, Gen.choose(1L, 9L)) { case (caps, nu) =>
      val lo = WaterfillModel.allocate(caps, nu, 10L)
      val hi = WaterfillModel.allocate(caps, nu + 1, 10L)
      caps.forall { case (k, _) => hi(k)._1 >= lo(k)._1 }
    }
}
