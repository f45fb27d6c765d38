package graft.ops

import graft.SparkSpec

/** Hand-computed market-basket pins: distinct-item support, the three
  * single-division scores, the minSupport gate.
  */
class AssociationSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("pairRules: hand-computed lift and confidences; dup rows don't " +
      "inflate support") {
    // baskets: o1{1,2} o2{1,2} o3{1,3} o4{2} o5{1,2}; a duplicate
    // (o1, 1) line must not change anything.
    // cnt(1)=4 cnt(2)=4 cnt(3)=1, n_orders=5, pair(1,2)=3 pair(1,3)=1
    // lift(1,2) = 3·5/(4·4) = 0.9375; both confidences 0.75
    val li = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 2L), (5L, 1L), (5L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val got = Association.pairRules(li, minSupport = 2, k = 10)
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 4L, 4L, 5L, 0.9375, 0.75, 0.75)),
      got.toString)
    // minSupport 1 admits the hapax pair too
    assert(Association.pairRules(li, minSupport = 1, k = 10)
      .count() == 2L)
  }
}
