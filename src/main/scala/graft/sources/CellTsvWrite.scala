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

  // One open stream per page, fed as rows arrive: buffering a whole
  // partition's lines in memory (the previous shape) scales task
  // memory with partition size — an OOM at exactly the corpus sizes
  // the connector exists for. Memory is now O(pages in partition)
  // file handles; the reader skips empty lines, so a trailing
  // newline per file is harmless.
  private val streams =
    mutable.Map.empty[Int, (Path, java.io.BufferedWriter)]

  private def streamFor(page: Int): java.io.BufferedWriter =
    streams.getOrElseUpdate(page, {
      Files.createDirectories(Paths.get(path))
      val tmp: Path = Paths.get(path,
        s".page=$page-p$partitionId-${UUID.randomUUID()}.tmp")
      (tmp, Files.newBufferedWriter(tmp))
    })._2

  override def write(row: InternalRow): Unit = {
    val cellsData = row.getArray(4)
    val cells = (0 until cellsData.numElements())
      .map(i => cellsData.getUTF8String(i).toString)
    val line = s"${row.getLong(0)}\t${row.getInt(1)}\t${row.getInt(2)}\t" +
      s"${row.getLong(3)}\t${CellTsvSource.encodeCells(cells)}"
    val out = streamFor(row.getInt(1))
    out.write(line)
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    streams.values.foreach { case (_, w) => w.close() }
    CellTsvTaskCommit(streams.values.map(_._1.toString).toSeq)
  }

  // A failure mid-write leaves temps that never reach a commit
  // message; the task-side abort is the only place that knows them.
  override def abort(): Unit = streams.values.foreach { case (p, w) =>
    try w.close() catch { case _: Throwable => () }
    Files.deleteIfExists(p)
  }
  override def close(): Unit = ()
}
