package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors `tests/test_utils.py:166-230` (chunked, page range,
  * format_duration).
  */
class PageRangeSpec extends AnyFunSuite {
  import PageRange._

  test("validate_page_range") {
    assert(validate("1,3,5-7,10"))
    assert(validate("2-2"))
    assert(!validate("1,,3"))
    assert(!validate("a-b"))
    assert(!validate(""))
  }

  test("parse_page_range expand/sort/clip") {
    assert(parse("1", 10) == Seq(1))
    assert(parse("1,3,5", 10) == Seq(1, 3, 5))
    assert(parse("1-3", 10) == Seq(1, 2, 3))
    assert(parse("1-15", 10) == (1 to 10))
    assert(parse("1-3,2,5-6,100", 10) == Seq(1, 2, 3, 5, 6))
  }

  test("parse_page_range invalid raises") {
    intercept[NumberFormatException](parse("a-b", 10))
  }

  test("chunked") {
    assert(chunked((1 to 9).toList, 4).toList ==
      List(List(1, 2, 3, 4), List(5, 6, 7, 8), List(9)))
    assert(chunked(List.empty[Int], 3).toList == Nil)
    assert(chunked(List(1), 3).toList == List(List(1)))
    assert(chunked(List(1, 2), 5).toList == List(List(1, 2)))
    assert(chunked(List(1, 2, 3), 1).toList ==
      List(List(1), List(2), List(3)))
    intercept[IllegalArgumentException](chunked(List(1, 2, 3), 0))
    assert(chunked(List(1, 2, 3), -2).toList == Nil)
  }

  test("format_duration") {
    assert(formatDuration(3723.4) == "1h 2m 3s")
    assert(formatDuration(125.0) == "2m 5s")
    assert(formatDuration(3.5) == "3.50s")
  }
}
