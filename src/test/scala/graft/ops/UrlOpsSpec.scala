package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canonicalization pins: case, ports, slashes, fragments, tracking
  * params, param order — every rule by example.
  */
class UrlOpsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")))
      .as[String].collect().toSeq

  test("the messy and clean spellings of one page collapse") {
    assert(canon(
      "HTTPS://Site.COM:443/d/5/?utm_source=feed&b=2&a=1#sec",
      "https://site.com/d/5?a=1&b=2").distinct ==
      Seq("https://site.com/d/5?a=1&b=2"))
  }

  test("root paths normalize to a single slash; bare host gets one") {
    assert(canon("http://H.com/", "http://h.COM") ==
      Seq("http://h.com/", "http://h.com/"))
  }

  test("only DEFAULT ports drop; real ports survive") {
    assert(canon("http://h.com:80/x", "http://h.com:8080/x") ==
      Seq("http://h.com/x", "http://h.com:8080/x"))
  }

  test("default-port stripping is SCHEME-dependent (ADVICE r15): " +
      "https://h:80 and http://h:443 are distinct origins and keep " +
      "their ports") {
    assert(canon(
      "https://h.com:80/x", "http://h.com:443/x",
      "https://h.com:443/x", "http://h.com:80/x") ==
      Seq("https://h.com:80/x", "http://h.com:443/x",
        "https://h.com/x", "http://h.com/x"))
    // unknown scheme: no port is default — keep whatever is there
    assert(canon("ftp://h.com:80/x") == Seq("ftp://h.com:80/x"))
  }

  test("all-tracking query strings vanish entirely") {
    assert(canon("https://h.com/p?utm_source=a&utm_medium=b&ref=x") ==
      Seq("https://h.com/p"))
    assert(canon("https://h.com/p?z=1&utm_campaign=c&a=2") ==
      Seq("https://h.com/p?a=2&z=1"))
  }

  test("path case and non-tracking params are preserved") {
    assert(canon("https://h.com/Path/To?q=Mixed") ==
      Seq("https://h.com/Path/To?q=Mixed"))
  }
}
