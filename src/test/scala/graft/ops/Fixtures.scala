package graft.ops

/** Fabricated camelot-shaped tables mirroring the reference's
  * `tests/test_extractors.py:108-403` fixtures (test data, not code —
  * the pinned inputs that define extractor behavior).
  */
object Fixtures {

  /** `_df_area` (`test_extractors.py:108-190`): 9-col area table with
    * kerned headers, banner rows, row-number artifacts, trailing
    * code-less rows.
    */
  val dfArea: Seq[Seq[String]] = Seq(
    Seq("K O D E", "NAMA PROVINSI / KABUPATEN / KOTA", "JUMLAH", "",
      "N A M A / J U M L A H", "", "", "LUAS WILAYAH (Km2)",
      "K E T E R A N G A N"),
    Seq("", "KAB", "KOTA", "KECAMATAN", "KELURAHAN", "D E S A", "", "", ""),
    Seq("11", "Aceh", "", "", "", "", "", "",
      "Undang-undang Nomor 11 Tahun 2006 tentang Pemerintahan Aceh"),
    Seq("11.01", "Kabupaten Aceh Selatan", "18", "0", "260", "",
      "4.174,211",
      "Perbaikan nama ibu kota semula Tapak Tuan menjadi Tapaktuan sesuai Undang-Undang Nomor 12 Tahun 2024 tentang Kabupaten Aceh Selatan di Aceh."),
    Seq("11.01.01", "1 Bakongan", "-", "7", "", "", "", ""),
    Seq("11.01.01.2001", "1 Keude Bakongan", "", "", "", "", "", ""),
    Seq("11.01.01.2002", "2 Ujong Mangki", "", "", "", "", "",
      "Perbaikan nama sesuai Surat Pemkab Aceh Selatan No.140/819/2016 tgl 14 okt 2016 dan Rekomendasi Ditjen Bina Pemdes No. 146/3672/BPD tgl 21 Juni 2017"),
    Seq("11.01.01.2003", "3 Ujong Padang", "", "", "", "", "",
      "Perbaikan nama sesuai Surat Pemkab Aceh Selatan No.140/819/2016 tgl 14 okt 2016 dan Rekomendasi Ditjen Bina Pemdes No. 146/3672/BPD tgl 21 Juni 2017"),
    Seq("11.01.01.2004", "4 Gampong Drien", "", "", "", "", "",
      "Perbaikan nama sesuai Surat Pemkab Aceh Selatan No.140/819/2016 tgl 14 okt 2016 dan Rekomendasi Ditjen Bina Pemdes No. 146/3672/BPD tgl 21 Juni 2017"),
    Seq("", "", "", "", "", "", "Bukit Gadeng",
      "Menjadi wil Kec. Kota Bahagia Perda No. 3/2010"),
    Seq("", "", "", "", "", "", "Seuneubok Keuranji",
      "Menjadi wil Kec. Kota Bahagia Perda No. 3/2010"))

  /** `_df_area_unmatched` (`test_extractors.py:193-284`): 12-col table
    * whose first header is "NO", so the area predicate must reject it.
    */
  val dfAreaUnmatched: Seq[Seq[String]] = Seq(
    Seq("NO", "KODE", "NAMA PROVINSI,\nKABUPATEN / KOTA,\nKECAMATAN",
      "IBUKOTA", "J U M L A H", "", "", "", "", "LUAS \nWILAYAH\n(Km2) *",
      "JUMLAH \nPENDUDUK\n (Jiwa) **", "K ET E R A N G A N"),
    Seq("", "", "", "", "KAB", "KOTA", "KEC", "KEL", "DESA"),
    Seq("I", "11", "Aceh", "Banda Aceh", "18", "5", "290", "", "6500",
      "56.835", "5.623.479",
      "Undang-undang Nomor 11 Tahun 2006 tentang Pemerintahan Aceh"),
    Seq("", "11.01", "1\nKabupaten Aceh Selatan", "Tapaktuan", "", "",
      "18", "0", "260", "4.174", "239.629",
      "Perbaikan nama ibu kota semula Tapak Tuan menjadi Tapaktuan \nsesuai Undang-Undang Nomor 12 Tahun 2024 tentang Kabupaten \nAceh Selatan di Aceh."),
    Seq("", "11.01.01", "Bakongan\n1", "", "", "", "", "", "7", "", "", ""),
    Seq("", "11.01.02", "Kluet Utara\n2", "", "", "", "", "", "7", "", "", ""),
    Seq("", "11.01.03", "Kluet Selatan\n3", "", "", "", "", "", "7", "", "", ""))

  /** `_df_island` (`test_extractors.py:287-358`). */
  val dfIsland: Seq[Seq[String]] = Seq(
    Seq("Kode Pulau", "Nama Provinsi, Kabupaten/Kota, Pulau", "Jumlah",
      "Koordinat", "Luas\n2\n(Km )", "BP/TBP", "Keterangan"),
    Seq("11.01", "Kabupaten Aceh Selatan", "6", "", "", "", ""),
    Seq("11.01.40001", "Pulau Batukapal", "",
      "03°19'03.44\" U 097°07'41.73\" T", "0.0006", "TBP", ""),
    Seq("11.01.40002", "Pulau Batutunggal", "",
      "03°24'55.00\" U 097°04'21.00\" T", "0.0078", "TBP", ""),
    Seq("11.01.40004", "Pulau Mangki", "",
      "02°54'25.11\" U 097°26'18.51\" T", "", "TBP", ""),
    Seq("11.03", "Kabupaten Aceh Timur", "8", "", "", "", ""),
    Seq("11.03.40003", "Pulau Krueng Beukah", "",
      "04°36'19.18\" U 098°01'02.04\" T", "0.1152", "", ""),
    Seq("11.03.40005", "Pulau Nebukserdang", "",
      "05°06'37.00\" U 097°37'35.00\" T", "", "BP", ""),
    Seq("11.06.40007", "Pulau Bateeleblah", "",
      "05°47'34.72\" U 094°58'26.09\" T", "0.0080", "TBP", "(PPKT)"))

  /** `_df_island_messy` (`test_extractors.py:361-403`). */
  val dfIslandMessy: Seq[Seq[String]] = Seq(
    Seq("Kode Pulau", "Nama Provinsi, Kabupaten/Kota, Pulau", "Koordinat",
      "BP/TBP", "Keterangan"),
    Seq("12.00.40001", "Pulau 1", "01°22'40 U 120°53'04 T", "BP", "(PPKT)"),
    Seq("12.00.40002", "Pulau 2", "03° 31'33.49\" U 125° 39'37.53\" T", "",
      "(PPKT)"),
    Seq("12.01.40003", "Pulau 3", "01°18'47.00\"\" U 124°30'46.00\"\" T",
      "TBP", ""),
    Seq("12.01.40004", "Pulau 4", "01°22'40\" U 120°53'04\" T", "", ""))
}
