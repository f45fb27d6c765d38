package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawler-side dedup key: the same page
  * arrives as `HTTPS://Site.COM:443/d/5/?utm_source=feed&b=2&a=1#sec`
  * and `https://site.com/d/5?a=1&b=2`, and a corpus that treats those
  * as distinct double-counts every domain. One canonical form, built
  * from pure per-row string algebra (no UDF, fully codegen):
  *
  *  - fragment dropped, scheme and host lowercased,
  *  - DEFAULT ports dropped scheme-dependently — `:443` only under
  *    https, `:80` only under http (an `https://host:80` is a
  *    non-default origin and must NOT collapse into `https://host`;
  *    unconditional stripping over-merges distinct origins in the
  *    dedup key — ADVICE r15),
  *  - trailing path slashes trimmed (bare root stays `/`),
  *  - tracking params (`utm_*`, `ref`) dropped, the rest SORTED —
  *    param order never distinguishes two URLs.
  *
  * Every step is deterministic string/regex algebra that replays
  * identically in any engine (RE2-safe patterns, binary sort order).
  */
object UrlOps {

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z]+://", "")
    val hostPort = regexp_extract(rest, "^([^/?]+)", 1)
    // strip only the port that is DEFAULT for the url's own scheme
    val defaultPort = when(scheme === "https", lit(":443$"))
      .when(scheme === "http", lit(":80$"))
      .otherwise(lit("$^")) // matches nothing: unknown scheme keeps port
    val host = lower(regexp_replace(hostPort, defaultPort, lit("")))
    // everything after the authority — regex strip, no offset math
    val pathQ = regexp_replace(rest, "^[^/?]+", "")
    val path0 = regexp_replace(
      regexp_extract(pathQ, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|ref)="))
    val sortedQ = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit(""))
        .otherwise(concat(lit("?"), sortedQ)))
  }
}
