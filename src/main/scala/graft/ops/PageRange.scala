package graft.ops

/** S3/S4/F9 driver utilities (reference `utils.py:82-110`):
  * page-range grammar, chunking, duration formatting. Pure Scala —
  * these parameterize the scan (partition pruning analog), they are
  * not per-row operators.
  */
object PageRange {

  /** `validate_page_range` (`utils.py:87-89`): `1,3,5-7,10` grammar. */
  def validate(pageRange: String): Boolean =
    pageRange.matches("^(\\d+(-\\d+)?)(,(\\d+(-\\d+)?))*$")

  /** `parse_page_range` (`utils.py:92-100`): expand + sort + clip to
    * [1, totalPages]; out-of-range pages silently dropped.
    */
  def parse(pageRange: String, totalPages: Int): Seq[Int] = {
    val pages = scala.collection.mutable.Set.empty[Int]
    for (part <- pageRange.split(",")) {
      if (part.contains("-")) {
        val Array(start, end) = part.split("-", 2).map(_.toInt)
        pages ++= (start to end)
      } else pages += part.toInt
    }
    pages.filter(p => p >= 1 && p <= totalPages).toSeq.sorted
  }

  /** `chunked` (`utils.py:82-84`): micro-batch split. Size 0 raises
    * (Python `range` step-0 ValueError); negative yields nothing.
    */
  def chunked[T](xs: Seq[T], size: Int): Iterator[Seq[T]] = {
    if (size == 0)
      throw new IllegalArgumentException("chunk size must not be zero")
    if (size < 0) Iterator.empty
    else xs.grouped(size)
  }

  /** `format_duration` (`utils.py:103-110`): seconds ->
    * "1h 2m 3s" / "2m 5s" / "3.50s".
    */
  def formatDuration(duration: Double): String = {
    val hours = (duration / 3600).toInt
    val remainder = duration - hours * 3600
    val minutes = (remainder / 60).toInt
    val seconds = remainder - minutes * 60
    if (hours != 0) s"${hours}h ${minutes}m ${seconds.toInt}s"
    else if (minutes != 0) s"${minutes}m ${seconds.toInt}s"
    else f"$seconds%.2fs"
  }
}
