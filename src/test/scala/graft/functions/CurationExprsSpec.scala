package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NFC normalization and the deflate redundancy signal. */
class CurationExprsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("nfcNormalize precomposes combining marks; idempotent; NFC-clean text unchanged") {
    val decomposed = "désa été" // e + U+0301
    val precomposed = "désa été"
    val df = Seq(decomposed, precomposed, "plain ascii", "")
      .toDF("s")
      .select(CurationExprs.nfcNormalize(col("s")).as("n"), col("s"))
    val rows = df.collect().map(r => (r.getString(1), r.getString(0)))
    rows.foreach { case (in, out) =>
      assert(out == java.text.Normalizer.normalize(
        in, java.text.Normalizer.Form.NFC))
      assert(CurationNative.nfc(out) == out, "idempotent")
    }
    assert(rows.toMap.apply(decomposed) == precomposed)
    assert(rows.toMap.apply("plain ascii") == "plain ascii")
  }

  test("graft_nfc / graft_deflate_size are callable from SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_nfc('été') AS n, " +
        "graft_deflate_size('abcabcabc') AS z").head
    assert(r.getString(0) == "été")
    assert(r.getLong(1) > 0L)
  }

  test("opaqueIdentity: identity semantics, and the audit's double deflate survives optimization") {
    // identity, including null passthrough
    val rows = Seq("abc", null: String).toDF("s")
      .select(CurationExprs.opaqueIdentity(col("s")))
      .collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq == Seq(Some("abc"), None))
    // plan pin (ADVICE r9): the compression_signal repeat audit relies
    // on its two deflate runs staying two distinct evaluations. With
    // the graft-owned barrier that must hold STRUCTURALLY: after full
    // optimization the plan still carries two DeflateSizeExpr nodes,
    // one wrapped in OpaqueIdentityExpr, and the two are not
    // semantically equal (so codegen subexpression elimination cannot
    // unify them either).
    // range (not a local Seq) so ConvertToLocalRelation cannot
    // pre-evaluate the projection out of the plan
    val audit = spark.range(1).selectExpr("cast(id as string) as s").select(
      (CurationExprs.deflateSize(col("s")) ===
        CurationExprs.deflateSize(CurationExprs.opaqueIdentity(col("s"))))
        .as("eq"))
    val deflates = audit.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case d: DeflateSizeExpr => d })
    assert(deflates.size == 2, audit.queryExecution.optimizedPlan.toString)
    assert(deflates.count(_.child.isInstanceOf[OpaqueIdentityExpr]) == 1)
    assert(!deflates(0).semanticEquals(deflates(1)))
    assert(audit.head.getBoolean(0))
  }

  test("deflateSize: deterministic, repetitive text compresses far better") {
    val repetitive = "spam " * 400
    val prose = (1 to 400).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val df = Seq(repetitive, prose).toDF("s")
      .select(col("s"), CurationExprs.deflateSize(col("s")).as("z"),
        length(col("s")).cast("long").as("n"))
    val once = df.collect().map(r => (r.getString(0).take(4), r.getLong(1),
      r.getLong(2))).toSeq
    val again = df.collect().map(r => (r.getString(0).take(4), r.getLong(1),
      r.getLong(2))).toSeq
    assert(once == again, "deterministic across evaluations")
    val byKey = once.map { case (k, z, n) => k -> (z, n) }.toMap
    val (zRep, nRep) = byKey("spam")
    val (zPro, nPro) = byKey(prose.take(4))
    assert(zRep * 10 < nRep, s"repetitive must compress >10x: $zRep/$nRep")
    assert(zRep.toDouble / nRep < zPro.toDouble / nPro,
      "repetitive compresses better than prose")
    assert(zPro > 0 && zPro <= nPro + 64)
  }
}
