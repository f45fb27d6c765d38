package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** Write side of the CellTsv DataSource V2 connector — a real
  * two-phase commit: each task stages its page files under dotted temp
  * names and reports them in its commit message; only the DRIVER's
  * `commit` renames the whole batch into visible `page=N-…` names, and
  * `abort` deletes the stage. A reader never observes a torn write,
  * and speculative/retried tasks can't double-publish (their temp
  * files are simply never committed).
  *
  * Rows are grouped by `page` task-side, so the on-disk layout keeps
  * the page-pruning property of the read path ([[CellTsvScan]]).
  */
private[sources] class CellTsvWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new CellTsvWriteImpl(path, doTruncate)
}

private[sources] class CellTsvWriteImpl(path: String, truncate: Boolean)
    extends Write {
  override def toBatch: BatchWrite = new CellTsvBatchWrite(path, truncate)
}

private[sources] case class CellTsvTaskCommit(tempFiles: Seq[String])
    extends WriterCommitMessage

private[sources] class CellTsvBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new CellTsvWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // An overwrite of an EMPTY DataFrame into a fresh path runs no
    // DataWriter (so nothing created the directory), yet truncate
    // still lists it below — guarantee existence first.
    Files.createDirectories(Paths.get(path))
    if (truncate) {
      // overwrite semantics: clear prior visible files just before
      // publishing the new batch (staged temps are unaffected)
      scala.util.Using.resource(Files.list(Paths.get(path))) { s =>
        s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(CellTsvSource.FileSuffix))
          .foreach(Files.deleteIfExists(_))
      }
    }
    messages.foreach {
      case CellTsvTaskCommit(temps) => temps.foreach { t =>
        val p = Paths.get(t)
        // ".page=N-<uuid>.tmp" -> "page=N-<uuid>.cells"
        val visible = p.getFileName.toString
          .stripPrefix(".").stripSuffix(".tmp") + CellTsvSource.FileSuffix
        Files.move(p, p.resolveSibling(visible),
          StandardCopyOption.ATOMIC_MOVE)
      }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CellTsvTaskCommit(temps) =>
        temps.foreach(t => Files.deleteIfExists(Paths.get(t)))
      case _ => ()
    }
}

private[sources] class CellTsvWriterFactory(path: String)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CellTsvDataWriter(path, partitionId)
}

private[sources] class CellTsvDataWriter(path: String, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val byPage = mutable.Map.empty[Int, mutable.ArrayBuffer[String]]
  private val written = mutable.ArrayBuffer.empty[Path]

  override def write(row: InternalRow): Unit = {
    val cellsData = row.getArray(4)
    val cells = (0 until cellsData.numElements())
      .map(i => cellsData.getUTF8String(i).toString)
    val line = s"${row.getLong(0)}\t${row.getInt(1)}\t${row.getInt(2)}\t" +
      s"${row.getLong(3)}\t${CellTsvSource.encodeCells(cells)}"
    byPage.getOrElseUpdate(row.getInt(1), mutable.ArrayBuffer.empty) += line
  }

  override def commit(): WriterCommitMessage = {
    Files.createDirectories(Paths.get(path))
    val temps = byPage.toSeq.map { case (page, lines) =>
      val tmp: Path = Paths.get(path,
        s".page=$page-p$partitionId-${UUID.randomUUID()}.tmp")
      written += tmp // tracked BEFORE the write so abort can clean up
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      tmp.toString
    }
    CellTsvTaskCommit(temps)
  }

  // A failure mid-commit leaves temps that never reach a commit
  // message; the task-side abort is the only place that knows them.
  override def abort(): Unit = written.foreach(Files.deleteIfExists(_))
  override def close(): Unit = ()
}
