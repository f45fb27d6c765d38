package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.BpeMergeTable
import graft.ops.BpeMiner

/** External tokenizer-model import (VERDICT r17 #2): GPT-2-format
  * `merges.txt` through the flat priority-merge encoder — the
  * concatenation-product dialect that CANNOT be replayed as
  * whole-text replaces (symbol boundaries vanish when merged tokens
  * abut), i.e. exactly the case the r18 flat encoder exists for.
  */
class RunBpeSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val mergesTxt =
    """#version: 0.2
      |a b
      |ab c
      |x y
      |abc ĠGPT
      |""".stripMargin

  test("parseMergesTxt: header and blank lines skipped, rank = line " +
      "order, malformed lines rejected") {
    val got = BpeMiner.parseMergesTxt(mergesTxt.linesIterator)
    assert(got == Seq(("a", "b"), ("ab", "c"), ("x", "y"),
      ("abc", "ĠGPT")), got.toString)
    intercept[IllegalArgumentException] {
      BpeMiner.parseMergesTxt(Iterator("a b c"))
    }
    intercept[IllegalArgumentException] {
      BpeMiner.parseMergesTxt(Iterator("lonely"))
    }
  }

  test("imported dialect: merge products are CONCATENATIONS — " +
      "'ab c' must match the product of 'a b', hand-computed ids") {
    val merges = BpeMiner.parseMergesTxt(mergesTxt.linesIterator)
    val docs = Seq(
      // "abc": a+b → [M0, c]; ab+c → [M1]  (one token)
      // "ab":  a+b → [M0]
      // "q":   no merges → [q]
      (0L, "web", "abc ab q"),
      // "xyxy": x+y fires at BOTH sites in one pass → [M2, M2]
      (1L, "web", "xyxy"))
      .toDF("doc_id", "source", "text")
    val got = BpeMiner.encodeWithImportedMerges(docs, merges)
      .orderBy("doc_id")
      .as[(Long, String, Long, String, String)].collect().toSeq
    val m0 = 0x110000; val m1 = 0x110001; val m2 = 0x110002
    assert(got.map(r => (r._1, r._3, r._5)) == Seq(
      (0L, 3L, s"$m1,$m0,${'q'.toInt}"),
      (1L, 2L, s"$m2,$m2")), got.toString)
  }

  test("round-trip through a merges.txt FILE (the RunBpe --merges " +
      "lifecycle) and a fertility-style aggregate under the model") {
    val f = Files.createTempFile("graft-merges-", ".txt")
    Files.write(f, mergesTxt.getBytes("UTF-8"))
    val src = scala.io.Source.fromFile(f.toFile, "UTF-8")
    val loaded = try BpeMiner.parseMergesTxt(src.getLines())
      finally src.close()
    assert(loaded.size == 4)
    val docs = Seq(
      (0L, "en", "abc abc xy"),
      (1L, "de", "plain words here"))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", org.apache.spark.sql.functions.col("lang"))
    val enc = BpeMiner.encodeWithImportedMerges(docs, loaded)
    // fertility numerator per language under the IMPORTED model:
    // en: abc→1, abc→1, xy→1 = 3 tokens over 3 words;
    // de: untouched chars = 5+5+4 = 14 tokens over 3 words
    val fert = enc.join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(fert == Map("en" -> 3L, "de" -> 14L), fert.toString)
  }

  test("dialect guard: fromRawMerges rejects multi-codepoint symbols " +
      "(those are the imported dialect), fromSymbolMerges keeps " +
      "duplicate products dead rather than remapping them") {
    intercept[IllegalArgumentException] {
      BpeMergeTable.fromRawMerges(Seq(("ab", "c")))
    }
    // duplicate product "ab" at rank 2: rank 1's id must win (rank
    // 2's occurrences were all consumed by rank 1's pass)
    val t = BpeMergeTable.fromSymbolMerges(
      Seq(("a", "b"), ("a", "b"), ("ab", "c")))
    val docs = Seq((0L, "web", "abc")).toDF("doc_id", "source", "text")
    val got = BpeMiner.encodeWithTable(docs, t)
      .as[(Long, String, Long, String, String)].collect().head
    assert(got._3 == 1L && got._5 == s"${0x110002}", got.toString)
  }

  test("byte-level TRAINED model persists and reads back rank-exact " +
      "(the RunBpe train-bytelevel / --model-bytelevel lifecycle)") {
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "ab ab ab"), (1L, "ab qq")).toDF("doc_id", "text")
    val trained = BpeMiner.trainByteLevelMergesLocal(docs, rounds = 3)
    // persist in the CLI's parquet layout, read back, rebuild the table
    val dir = Files.createTempDirectory("blt-model").toString
    trained.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }.toSeq
      .toDF("merge_rank", "l", "r", "pair_cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges_bytelevel")
    val back = spark.read.parquet(s"$dir/merges_bytelevel")
      .orderBy(col("merge_rank"))
      .select(col("l"), col("r")).as[(String, String)].collect().toSeq
    assert(back == trained.map(t => (t._1, t._2)).toSeq, back.toString)
    // the rebuilt table counts identically to the in-memory one
    val t1 = BpeMergeTable.fromSymbolMerges(back)
    val n = docs.select(
        graft.functions.Gpt2ByteLevel.count(col("text"), t1).as("n"))
      .agg(sum(col("n"))).as[Long].collect().head
    val t0 = BpeMiner.byteLevelTableFor(docs, rounds = 3)
    val n0 = docs.select(
        graft.functions.Gpt2ByteLevel.count(col("text"), t0).as("n"))
      .agg(sum(col("n"))).as[Long].collect().head
    assert(n == n0, s"$n != $n0")
  }

  test("unigram model persists and reads back piece-exact (the " +
      "RunBpe train-unigram / --unigram lifecycle)") {
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "abab abab cd"), (1L, "abab cd cd"))
      .toDF("doc_id", "text")
    val model = graft.ops.UnigramLm.trainLocal(docs, vocabSize = 4)
    val dir = Files.createTempDirectory("uni-model").toString
    model.pieces.toSeq.sorted.toDF("piece", "cnt")
      .withColumn("max_piece_len", lit(model.maxPieceLen))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/unigram")
    val rows = spark.read.parquet(s"$dir/unigram").collect()
    val back = new graft.functions.UnigramModel(
      rows.map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt")))
        .toMap,
      rows.head.getAs[Int]("max_piece_len"))
    assert(back.pieces == model.pieces)
    assert(back.segment("ababcd") == model.segment("ababcd"))
  }
}
