package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.{Similarity, TextDedup}

/** Seeded fuzz parity: the native expressions must agree with their
  * composed built-in references on hundreds of adversarial inputs —
  * Unicode, empty tokens, runs of spaces, nulls, duplicates, NaN and
  * infinities — evaluated through real Spark plans (codegen path), not
  * just the interpreted eval.
  */
class NativeParitySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private def randomText(): String = {
    val alphabet = Seq("kota", "désa", "pulau", "統計", "данные", "x",
      "🌊", "a-b", "1", "", " ", "  ", " ")
    (0 until rnd.nextInt(30)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString(" ")
  }

  test("shingles + minhash parity on 300 random unicode texts, n=1..4") {
    val s = spark
    import s.implicits._
    val texts = Seq.fill(300)(randomText()).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .repartition(5)
    for (n <- 1 to 4) {
      val bad = texts.select(
        TextDedup.shingles(col("text"), n).as("native"),
        TextDedup.shinglesHof(col("text"), n).as("hof"),
        TextDedup.minHashSignature(TextDedup.shingles(col("text"), n), 16)
          .as("mh_native"),
        TextDedup.minHashSignatureHof(
          TextDedup.shinglesHof(col("text"), n), 16).as("mh_hof"))
        .filter(col("native") =!= col("hof") ||
          col("mh_native") =!= col("mh_hof"))
        .count()
      assert(bad == 0L, s"parity broke for n=$n")
    }
  }

  test("intersectCount parity on random arrays with nulls and dups") {
    val pool = Seq("a", "b", "c", "désa", "🌊", "", null)
    val rows = Seq.fill(300) {
      def arr() = Seq.fill(rnd.nextInt(8))(pool(rnd.nextInt(pool.length)))
      Row(arr(), arr())
    }
    val schema = StructType(Seq(
      StructField("a", ArrayType(StringType, containsNull = true)),
      StructField("b", ArrayType(StringType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val bad = df.select(
      TextExprs.intersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(bad == 0L)
  }

  test("fused dot-product parity on random float arrays incl. NaN/Inf") {
    val specials = Seq(Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, 0.0f, -0.0f, 1e30f, -1e-30f)
    def vec(n: Int): Seq[java.lang.Float] = Seq.fill(n) {
      val r = rnd.nextInt(10)
      if (r < 7) java.lang.Float.valueOf(rnd.nextFloat() * 2 - 1)
      else if (r < 9) java.lang.Float.valueOf(specials(rnd.nextInt(specials.length)))
      else null // null element -> both sides must yield NULL
    }
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(6)
      val m = if (rnd.nextInt(4) == 0) rnd.nextInt(6) else n // some ragged
      Row(vec(n), vec(m))
    }
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("fused"), // rewritten by rule
      graft.functions.NativeExpressions.dotProduct(col("a"), col("b"))
        .as("direct"))
      .collect()
    // the fused HOF formulation and the direct native node must agree
    // bit-for-bit, NaN and signed zero included
    got.foreach { r =>
      val x = if (r.isNullAt(0)) null
        else java.lang.Long.valueOf(
          java.lang.Double.doubleToLongBits(r.getDouble(0)))
      val y = if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(x == y, s"row mismatch: $r")
    }
  }
}
