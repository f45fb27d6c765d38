package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for page-partitioned cell-grid files — the
  * custom-source tier of the engine's extension ladder (SURVEY §2.1
  * S2 option b), standing in for "a JVM PDF-table reader" at the same
  * boundary.
  *
  * On-disk layout: a directory of `page=N.cells` text files, one line
  * per table row: `table_id <TAB> page <TAB> row_idx <TAB> seq <TAB>
  * cell1 \\x01 cell2 \\x01 …` (SOH-separated cells).
  *
  * The point of the exercise is PUSHDOWN: page predicates
  * (=, IN, <, <=, >, >=) are accepted in `pushFilters` and applied at
  * FILE-LISTING time — a query for pages 1-4 of a million-page corpus
  * plans exactly four input partitions and never opens the rest. That
  * is the reference's `--pages` semantics (`cli.py:146-150`) expressed
  * where it belongs at scale: in the source, before any I/O.
  */
class CellTsvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CellTsvSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CellTsvTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object CellTsvSource {
  val Schema: StructType = StructType(Seq(
    StructField("table_id", LongType),
    StructField("page", IntegerType),
    StructField("row_idx", IntegerType),
    StructField("seq", LongType),
    StructField("cells", ArrayType(StringType))))

  val CellSep = '\u0001' // SOH — never appears in extracted cell text
  val FileSuffix = ".cells"

  /** Cells field encoding: each cell PREFIXED (not joined) with SOH, so
    * zero cells ("") and one empty cell (a lone SOH) stay distinct —
    * an empty array must round-trip; the table width is load-bearing.
    *
    * Cell text is backslash-escaped for the line-oriented container:
    * raw `\n`/`\r` are routine in PDF-extracted cells (the cleanse
    * chain exists to strip artifacts like `"1\nBakongan"`), and an
    * unescaped newline would split one record across two physical
    * lines — the reader would then crash or silently misalign.
    * (Embedded TABs are safe as-is: the reader splits with limit 5, so
    * the cells field keeps everything after the fourth tab.)
    */
  def encodeCells(cells: Seq[String]): String =
    cells.map(c => CellSep.toString + escape(c)).mkString

  def decodeCells(field: String): Array[String] =
    if (field.isEmpty) Array.empty[String]
    else field.split(CellSep.toString, -1).drop(1).map(unescape)

  private def escape(s: String): String =
    if (s.indexOf('\\') < 0 && s.indexOf('\n') < 0 && s.indexOf('\r') < 0 &&
        s.indexOf(CellSep) < 0) s
    else {
      val sb = new StringBuilder(s.length + 8)
      s.foreach {
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        // the cell separator itself: a raw SOH inside cell text would
        // split one cell into two on read, shifting every later column
        case CellSep => sb.append("\\x01")
        case c => sb.append(c)
      }
      sb.toString
    }

  private def unescape(s: String): String =
    if (s.indexOf('\\') < 0) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case 'x' if s.regionMatches(i + 2, "01", 0, 2) =>
              sb.append(CellSep); i += 4
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

  /** Writer utility for the format (tests, interchange). */
  def write(dir: String, rows: Seq[(Long, Int, Int, Long, Seq[String])]): Unit = {
    Files.createDirectories(Paths.get(dir))
    rows.groupBy(_._2).foreach { case (page, pageRows) =>
      val lines = pageRows.map { case (t, p, r, s, cells) =>
        s"$t\t$p\t$r\t$s\t${encodeCells(cells)}"
      }
      Files.write(Paths.get(dir, s"page=$page$FileSuffix"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
  }
}

private[sources] class CellTsvTable(path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"cells($path)"
  override def schema(): StructType = CellTsvSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CellTsvScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new CellTsvWriteBuilder(path, info.schema())
}

private[sources] class CellTsvScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushedPagePredicates: Array[Filter] = Array.empty

  /** Accept page-column predicates for FILE PRUNING, but report every
    * filter back as residual: for `SupportsPushDownFilters` Spark
    * re-evaluates only the returned residual post-scan, so anything
    * omitted here is trusted as EXACT. Our page pushdown is a
    * listing-time pruning hint, not an exactness contract — a
    * hand-written `page=N` file containing stray rows must still be
    * caught by the post-scan Filter, at the cost of re-evaluating a
    * trivial int predicate per row.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushedPagePredicates = filters.filter {
      case EqualTo("page", _) | In("page", _) | LessThan("page", _) |
           LessThanOrEqual("page", _) | GreaterThan("page", _) |
           GreaterThanOrEqual("page", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushedPagePredicates

  override def build(): Scan = new CellTsvScan(path, pushedPagePredicates)
}

private[sources] class CellTsvScan(path: String, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = CellTsvSource.Schema
  override def toBatch: Batch = this

  private def pageAccepted(page: Int): Boolean = pushed.forall {
    case EqualTo("page", v: Int) => page == v
    case In("page", vs) => vs.exists(_ == page)
    case LessThan("page", v: Int) => page < v
    case LessThanOrEqual("page", v: Int) => page <= v
    case GreaterThan("page", v: Int) => page > v
    case GreaterThanOrEqual("page", v: Int) => page >= v
    case _ => true
  }

  /** File pruning happens HERE: one input partition per surviving
    * page file.
    */
  override def planInputPartitions(): Array[InputPartition] =
    scala.util.Using.resource(Files.list(Paths.get(path))) { stream =>
      stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(CellTsvSource.FileSuffix))
        .flatMap { p =>
          // accept both "page=N.cells" and writer-emitted
          // "page=N-pX-<uuid>.cells": the page id is the digit run
          val digits = p.getFileName.toString
            .stripPrefix("page=").takeWhile(_.isDigit)
          digits.toIntOption
            .filter(pageAccepted)
            .map(_ => CellTsvPartition(p.toString): InputPartition)
        }
        .toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new CellTsvReaderFactory

  override def description(): String =
    s"CellTsvScan(path=$path, pushedPagePredicates=${pushed.mkString(",")})"
}

private[sources] case class CellTsvPartition(file: String)
    extends InputPartition

private[sources] class CellTsvReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CellTsvReader(p.asInstanceOf[CellTsvPartition].file)
}

private[sources] class CellTsvReader(file: String)
    extends PartitionReader[InternalRow] {
  private val lines = Files.readAllLines(Paths.get(file)).iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      if (line.nonEmpty) {
        val parts = line.split("\t", 5)
        val cells = if (parts.length < 5) Array.empty[String]
          else CellTsvSource.decodeCells(parts(4))
        current = InternalRow(
          parts(0).toLong, parts(1).toInt, parts(2).toInt, parts(3).toLong,
          new GenericArrayData(
            cells.map(UTF8String.fromString(_): Any)))
        return true
      }
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
