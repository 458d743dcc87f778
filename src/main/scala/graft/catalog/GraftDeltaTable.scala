package graft.catalog

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MERGE-ON-READ managed table — the delta-based half of Spark's
  * row-level-operation seam ([[GraftTable]] is the copy-on-write half).
  *
  * A `SupportsDelta` operation makes Catalyst plan row-level DML as
  * `WriteDelta` instead of `ReplaceData`: the write receives only the
  * CHANGED rows, each dispatched to `DeltaWriter.insert/update/delete`
  * with its row-id, and the base data is never rewritten — write
  * amplification is delta-sized where copy-on-write rewrites whole
  * groups. The cost moves to the READ: every scan reconstructs the
  * effective table by folding the delta log over the base (exactly
  * Iceberg's MOR position-delete / Delta's deletion-vector trade).
  * GraftCatalogSpec pins the trade's observable: after a MERGE the base
  * is untouched and the log holds exactly |changeset| entries, while
  * the copy-on-write table rewrote all rows for the same statement.
  *
  * Storage is the same in-memory demo vehicle as GraftTable; the log
  * fold runs at scan-build on the driver (bounded by delta volume
  * between compactions — the parquet variant merges per partition).
  * Created via `TBLPROPERTIES ('graft.mode'='mor',
  * 'graft.row_id'='<col>')`; the row id must be a single existing
  * column, unique per row — the analyzer keys matched actions on it.
  */
class GraftDeltaTable(ident: String,
    tableSchema: StructType, rowIdCol: String)
    extends GraftTable(ident, tableSchema) {

  private val idOrdinal = tableSchema.fieldNames.indexWhere(
    _.equalsIgnoreCase(rowIdCol))
  require(idOrdinal >= 0,
    s"graft.row_id column $rowIdCol not in ${tableSchema.catalogString}")
  private val idType = tableSchema.fields(idOrdinal).dataType

  /** Delta log in commit order. op: 0 insert, 1 update, 2 delete. */
  private val log =
    scala.collection.mutable.ArrayBuffer.empty[GraftDeltaOp]

  private[graft] def baseRowCount: Long =
    currentRows.map(_.length.toLong).sum
  private[graft] def deltaLogSize: Int = synchronized(log.size)

  private def idKey(r: InternalRow, ordinal: Int): Any =
    r.get(ordinal, idType) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }

  /** A base REPLACE (INSERT OVERWRITE / compaction) supersedes the
    * log: stale delete/update entries replaying over the new base would
    * silently drop or rewrite fresh rows, so every replace clears the
    * log first. Appends keep it — they don't invalidate logged ops. */
  override private[catalog] def replaceRows(r: Array[Array[UnsafeRow]]): Unit =
    synchronized { log.clear(); super.replaceRows(r) }

  /** Effective rows = base folded with the delta log (the MOR read). */
  private def effectiveRows(): Array[Array[UnsafeRow]] = synchronized {
    val m = new java.util.LinkedHashMap[Any, UnsafeRow]()
    currentRows.foreach(_.foreach(r => m.put(idKey(r, idOrdinal), r)))
    log.foreach {
      case GraftDeltaOp(0, _, row) => m.put(idKey(row, idOrdinal), row)
      case GraftDeltaOp(1, id, row) => m.put(id, row)
      case GraftDeltaOp(2, id, _) => m.remove(id)
    }
    val all = new Array[UnsafeRow](m.size())
    val it = m.values().iterator()
    var i = 0
    while (it.hasNext) { all(i) = it.next(); i += 1 }
    if (all.isEmpty) Array(Array.empty[UnsafeRow]) else Array(all)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableSchema, effectiveRows())

  /** COMPACTION — the MOR maintenance op (Iceberg's rewrite_data_files,
    * Delta's OPTIMIZE): fold the delta log into the base and clear it.
    * Scans before and after return identical content; what changes is
    * who pays — reads stop folding the log, at the cost of one
    * base rewrite now. The q169 small-file compaction is the same
    * maintenance idea one level down (file layout instead of logical
    * log). Content-idempotent: compacting twice is a no-op. */
  private[graft] def compact(): Unit = synchronized {
    replaceRows(effectiveRows()) // replaceRows clears the log
  }

  // GraftTable's history tracks only BASE commits — a versioned read of
  // a MOR table would silently ignore the delta log, so refuse loudly.
  override private[catalog] def snapshotAt(v: Int): Table =
    throw new UnsupportedOperationException(
      "time travel is not supported on merge-on-read tables " +
        "(the delta log is not versioned in this implementation)")

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new SupportsDelta {
      override def command(): RowLevelOperation.Command = info.command()
      override def rowId(): Array[NamedReference] =
        Array(Expressions.column(rowIdCol))
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        GraftDeltaTable.this.newScanBuilder(options)
      override def newWriteBuilder(winfo: LogicalWriteInfo): DeltaWriteBuilder =
        new DeltaWriteBuilder {
          override def build(): DeltaWrite = new DeltaWrite {
            override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
              override def createBatchWriterFactory(
                  pinfo: PhysicalWriteInfo): DeltaWriterFactory =
                new GraftDeltaWriterFactory(tableSchema, idType)
              override def commit(messages: Array[WriterCommitMessage]): Unit =
                GraftDeltaTable.this.synchronized {
                  messages.foreach {
                    case m: GraftDeltaCommit => log ++= m.ops
                    case _ =>
                  }
                }
              override def abort(messages: Array[WriterCommitMessage]): Unit = ()
            }
          }
        }
      override def description(): String =
        s"GraftDeltaRowLevelOperation(${info.command()}, merge-on-read)"
    }
}

/** One logged change. op: 0 insert (row), 1 update (id -> row),
  * 2 delete (id). `id` is the extracted row-id VALUE (not a row), so
  * the log entry is self-contained and serialization-stable. */
case class GraftDeltaOp(op: Byte, id: Any, row: UnsafeRow)

case class GraftDeltaCommit(ops: Array[GraftDeltaOp])
    extends WriterCommitMessage

/** Per-task delta writer: Spark's DeltaWritingSparkTask has already
  * split each input row into (operation, id row, data row) through the
  * plan's WriteDeltaProjections, so unlike the group-based path there
  * is no layout guessing here — the dispatch IS the contract. Rows are
  * UnsafeProjection-copied to table layout; ids are extracted to plain
  * values. */
class GraftDeltaWriterFactory(schema: StructType,
    idType: org.apache.spark.sql.types.DataType)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val proj = UnsafeProjection.create(schema)
      private val ops = scala.collection.mutable.ArrayBuffer.empty[GraftDeltaOp]
      private def idOf(id: InternalRow): Any =
        id.get(0, idType) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other
        }
      override def insert(row: InternalRow): Unit =
        ops += GraftDeltaOp(0, null, proj(row).copy())
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit =
        ops += GraftDeltaOp(1, idOf(id), proj(row).copy())
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        ops += GraftDeltaOp(2, idOf(id), null)
      override def commit(): WriterCommitMessage = GraftDeltaCommit(ops.toArray)
      override def abort(): Unit = ops.clear()
      override def close(): Unit = ()
    }
}
