package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class CorpusSourcesSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("readJsonl parses good lines and quarantines corrupt ones") {
    val dir = Files.createTempDirectory("graft-jsonl-")
    Files.writeString(dir.resolve("part0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s", "n_chars": 7}
        |{not json at all
        |{"doc_id": 3, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |""".stripMargin)
    val (good, bad) = CorpusSources.readJsonl(spark, dir.toString)
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val quarantined = bad.as[String].collect()
    assert(quarantined.length == 1 && quarantined(0).contains("not json"))
  }

  test("readBinaryFiles lists payloads with glob pruning") {
    val dir = Files.createTempDirectory("graft-bin-")
    Files.write(dir.resolve("a.fakeimg"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.fakeimg"), Array[Byte](9, 8))
    Files.writeString(dir.resolve("ignore.txt"), "not media")
    val df = CorpusSources.readBinaryFiles(spark, dir.toString, "*.fakeimg")
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("n_bytes")).sorted.toSeq == Seq(2L, 4L))
    // payload bytes round-trip, ready for Multimodal.featurizeBatched
    assert(rows.exists(_.getAs[Array[Byte]]("payload").toSeq ==
      Seq[Byte](1, 2, 3, 4)))
  }
}
