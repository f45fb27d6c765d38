package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Transliteration of the 16-branch pinned table
  * `tests/test_utils.py:112-158` for format_coordinate.
  */
class CoordinatesSpec extends AnyFunSuite {
  import Coordinates.formatCoordinateScala

  private val cases: Seq[(String, String)] = Seq(
    // Baseline: already canonical
    ("03°19'03.44\" N 097°07'41.73\" E", "03°19'03.44\" N 097°07'41.73\" E"),
    // Indonesian hemispheres -> N/E
    ("03°19'03.44\" U 097°07'41.73\" T", "03°19'03.44\" N 097°07'41.73\" E"),
    ("03°19'03.44\" LU 097°07'41.73\" BT", "03°19'03.44\" N 097°07'41.73\" E"),
    // Whitespace
    ("03° 31'33.49\"  U   125° 39'37.53\"   T", "03°31'33.49\" N 125°39'37.53\" E"),
    // S/W mapping + seconds padding to 2 decimals
    ("03°19'03.4\" S 097°07'41.7\" B", "03°19'03.40\" S 097°07'41.70\" W"),
    // Duplicate quotes
    ("01°18'47.00\"\" U 124°30'46.00\"\" T", "01°18'47.00\" N 124°30'46.00\" E"),
    // Seconds truncation to 2 decimals
    ("03°19'03.444\" N 097°07'41.735\" E", "03°19'03.44\" N 097°07'41.73\" E"),
    // Missing seconds quote -> should add one
    ("03°19'03.44 N 097°07'41.73 E", "03°19'03.44\" N 097°07'41.73\" E"),
    // Smart quotes / double prime normalize
    ("03°19’03.44″ LU 097°07’41.73″ BT", "03°19'03.44\" N 097°07'41.73\" E"),
    // LAT first, LON second, then another LAT
    ("03°19'03.44\" N 097°07'41.73\" E 00°00'00\" N", "03°19'03.44\" N 097°07'41.73\" E"),
    // LON first, LAT second, then another LON
    ("097°07'41.73\" E 03°19'03.44\" N 000°00'00\" E", "03°19'03.44\" N 097°07'41.73\" E"),
    // Negative: hemisphere in front of token
    ("N 03°19'03.44\" E 097°07'41.73\"", "N 03°19'03.44\" E 097°07'41.73\""),
    // Negative: hemisphere leading, DMS invalid -> fallback
    ("N 03 19 03.4 E 097 07 41.7", "N 03 19 03.4 E 097 07 41.7"),
    // Negative: trailing hemi, odd spacing, invalid DMS -> normalized fallback
    ("03 19 03.4   N   097 07 41.7   E", "03 19 03.4 N 097 07 41.7 E"),
    // Unparseable but hemisphere tokens -> normalized only
    ("U T", "N E"),
    // Unparseable, no hemisphere tokens -> input back
    ("abc", "abc"),
    ("Invalid coordinate", "Invalid coordinate"))

  test("format_coordinate covers all pinned branches") {
    for ((raw, expected) <- cases) {
      assert(formatCoordinateScala(raw) == expected,
        s"input: ${raw.replace("\"", "\\\"")}")
    }
  }

  test("format_coordinate empty inputs") {
    for (raw <- Seq("", "   ", "\t", "\n", null))
      assert(formatCoordinateScala(raw) == "")
  }

  test("format_coordinate NBSP-separated input normalizes") {
    assert(formatCoordinateScala("03°19'03.44\" U 097°07'41.73\" T") ==
      "03°19'03.44\" N 097°07'41.73\" E")
  }
}
