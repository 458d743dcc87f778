package graft.catalog

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory DSv2 catalog with SQL row-level DML: `MERGE INTO`,
  * `UPDATE`, `DELETE` as real SQL text against managed tables.
  *
  * Why this exists: Spark's parser accepts MERGE/UPDATE/DELETE, but the
  * built-in file sources reject them — the analyzer routes row-level DML
  * only to tables implementing `SupportsRowLevelOperations` (the public
  * DSv2 seam Delta/Iceberg plug into). This catalog is the engine's
  * minimal implementation of that seam: group-based (copy-on-write)
  * row-level operations at whole-table granularity, which makes
  * Catalyst's `RewriteMergeIntoTable` / `RewriteUpdateTable` /
  * `RewriteDeleteFromTable` rules plan the rewrite — the MERGE condition
  * evaluation, the matched/not-matched action arbitration, the
  * carry-over of untouched rows — entirely inside Spark's optimizer, on
  * a plan the engine controls.
  *
  * Scale honesty: the STORAGE here is an in-memory demo vehicle
  * (driver-held UnsafeRow batches, executor-shipped per read partition);
  * a lakehouse deployment swaps the storage for parquet files and
  * narrows the replacement group from whole-table to file/partition
  * granularity (the scan reports which groups matched; the write
  * replaces only those). The REWRITE MACHINERY — which is what q182
  * exercises — is identical at any granularity: it is Spark's own
  * group-based copy-on-write plan, the same shape Iceberg runs at PB
  * scale.
  *
  * Registered lazily via `spark.sql.catalog.<name> = graft.catalog.
  * GraftCatalog` (runtime conf — no session rebuild needed).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def nsPrefix(namespace: Array[String]): String =
    catalogName + "\u0000" + namespace.mkString(".") + "\u0000"
  private def key(ident: Identifier): String =
    nsPrefix(ident.namespace()) + ident.name()

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.tables.keySet().asScala.toArray
      .filter(_.startsWith(nsPrefix(namespace)))
      .map(k => Identifier.of(namespace, k.split("\u0000").last))

  override def loadTable(ident: Identifier): Table = {
    val t = GraftCatalog.tables.get(key(ident))
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  /** Time travel (`VERSION AS OF n`): every commit appends a snapshot to
    * the table's version history, and a versioned load returns a
    * READ-ONLY view pinned to that snapshot — the lakehouse snapshot-id
    * contract. The view is a plain Table (no SupportsWrite): writing to
    * the past must be a loud analysis error, not a lost update. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = GraftCatalog.tables.get(key(ident))
    if (t == null) throw new NoSuchTableException(ident)
    t.snapshotAt(version.toInt)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // 'graft.mode'='mor' selects the merge-on-read (delta-based) table;
    // default is copy-on-write. 'graft.row_id' names the MOR row id.
    val t =
      if ("mor".equalsIgnoreCase(properties.getOrDefault("graft.mode", "cow"))) {
        val idCol = properties.getOrDefault("graft.row_id", schema.fieldNames.head)
        // the analyzer rejects nullable row-id attributes, and a CTAS
        // query schema arrives all-nullable — pin the id column NOT NULL
        // in the stored schema (uniqueness stays the creator's contract)
        val pinned = StructType(schema.fields.map(f =>
          if (f.name.equalsIgnoreCase(idCol)) f.copy(nullable = false) else f))
        new GraftDeltaTable(ident.toString, pinned, idCol)
      } else new GraftTable(ident.toString, schema)
    val prev = GraftCatalog.tables.putIfAbsent(key(ident), t)
    if (prev != null) throw new TableAlreadyExistsException(ident)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.tables.remove(key(ident)) != null

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val t = GraftCatalog.tables.get(key(from))
    if (t == null) throw new NoSuchTableException(from)
    // conflict-check BEFORE removing the source (a failed rename must
    // not destroy it), and move the SAME instance — rebuilding a fresh
    // table here would silently drop everything the instance carries:
    // a MOR table's un-compacted delta log, the version history behind
    // VERSION AS OF, and the table KIND itself (a renamed MOR table
    // would demote to copy-on-write). name() keeps reporting the
    // creation identifier — cosmetic, the store key is what resolves.
    if (GraftCatalog.tables.putIfAbsent(key(to), t) != null)
      throw new TableAlreadyExistsException(to)
    GraftCatalog.tables.remove(key(from)): Unit
  }

  // -- SupportsNamespaces (flat: the default namespace always exists) ----
  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = ()
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

object GraftCatalog {
  /** JVM-global store: Spark may instantiate the catalog plugin more
    * than once per session; content must survive re-instantiation. */
  private val tables = new ConcurrentHashMap[String, GraftTable]()
}

/** A managed in-memory table: readable, appendable/truncatable, and a
  * row-level-operation target (MERGE/UPDATE/DELETE). Content is an
  * immutable snapshot (`@volatile` swap on commit), so readers planned
  * against one snapshot never observe a concurrent commit mid-scan. */
class GraftTable(ident: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {

  @volatile private var rows: Array[Array[UnsafeRow]] = Array.empty
  /** Snapshot after each commit, in commit order — version n is the
    * state the n-th commit produced (CTAS seed = version 0). */
  private val history =
    scala.collection.mutable.ArrayBuffer.empty[Array[Array[UnsafeRow]]]

  private[catalog] def currentRows: Array[Array[UnsafeRow]] = rows
  private[catalog] def replaceRows(r: Array[Array[UnsafeRow]]): Unit =
    synchronized { rows = r; history += rows }
  private[catalog] def appendRows(r: Array[Array[UnsafeRow]]): Unit =
    synchronized { rows = rows ++ r; history += rows }

  /** Read-only view pinned to commit `v` (time travel). */
  private[catalog] def snapshotAt(v: Int): Table = synchronized {
    require(v >= 0 && v < history.size,
      s"version $v out of range [0, ${history.size})")
    new GraftSnapshotTable(s"$ident@v$v", tableSchema, history(v))
  }

  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  /** Highest streaming epoch already folded in — the exactly-once
    * guard: a crash-retried epoch re-commits with the same id and must
    * not double-append (see GraftWriteBuilder's streaming commit). */
  @volatile private[catalog] var lastCommittedEpoch: Long = Long.MinValue

  // ---- read path -------------------------------------------------------
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableSchema, rows)

  // ---- plain write path (INSERT INTO / INSERT OVERWRITE) ---------------
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(this, info.schema(), replace = false)

  // ---- row-level DML (MERGE / UPDATE / DELETE) -------------------------
  // Group-based (no SupportsDelta): Catalyst rewrites the DML into a
  // ReplaceData plan — scan the affected groups through `newScanBuilder`
  // below, compute the full replacement row set, write it through
  // `newWriteBuilder`. At whole-table granularity the replacement set IS
  // the new table, so the paired write commits with replace semantics.
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      // PRUNING-ONLY builder — never the filtering one: a copy-on-write
      // rewrite must read EVERY row of the replaced groups (the
      // non-matching rows are the carry-over that survives the DML), but
      // Spark pushes the DML condition into this scan for GROUP pruning.
      // A scan that row-filters on it silently deletes the carry-over —
      // UPDATE would drop every untouched row (spec-pinned).
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new GraftPruningScanBuilder(tableSchema, rows)
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
        new GraftWriteBuilder(GraftTable.this, winfo.schema(), replace = true)
      override def description(): String =
        s"GraftRowLevelOperation(${info.command()}, table-granularity copy-on-write)"
    }
}

/** Read-only table pinned to one historical snapshot — what
  * `VERSION AS OF n` resolves to. Deliberately NOT SupportsWrite. */
class GraftSnapshotTable(ident: String, tableSchema: StructType,
    snapshot: Array[Array[UnsafeRow]]) extends Table with SupportsRead {
  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableSchema, snapshot)
}

/** Scan builder with COLUMN PRUNING and FILTER PUSHDOWN: Catalyst
  * pushes the required schema and the scan predicates down; the reader
  * applies accepted filters and projects each surviving row to just the
  * required columns before handing it to the query — a
  * `SELECT k FROM t WHERE x > 5` over a wide table ships only matching,
  * k-only rows out of the scan, the same contract a parquet reader
  * honors with PushedFilters/ReadSchema. Both happen in the READER (per
  * task), not at plan time on the driver: the stored batches ship
  * whole, one predicate walk + projection per row where the data
  * already is.
  *
  * Pushdown correctness rule: a filter is ACCEPTED only if the reader
  * evaluates it with exactly Spark's semantics — the conservative set
  * here is null-safe comparisons and null tests on top-level
  * primitive-typed columns. Everything else is returned as
  * unsupported, and Spark keeps it as a post-scan Filter (the safe
  * default: rejecting a pushable filter costs performance, accepting
  * an unevaluatable one corrupts results). */
class GraftPruningScanBuilder(tableSchema: StructType,
    snapshot: Array[Array[UnsafeRow]])
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  protected var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val ordinals =
      if (required.fieldNames.sameElements(tableSchema.fieldNames)) None
      else Some(required.fieldNames.map(n =>
        tableSchema.fieldNames.indexWhere(_.equalsIgnoreCase(n))))
    new GraftScan(tableSchema, required, ordinals, pushed, snapshot)
  }
}

class GraftScanBuilder(tableSchema: StructType,
    snapshot: Array[Array[UnsafeRow]])
    extends GraftPruningScanBuilder(tableSchema, snapshot)
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter]):
      Array[org.apache.spark.sql.sources.Filter] = {
    val (ok, rest) = filters.partition(GraftFilterEval.supports(tableSchema, _))
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed
}

/** Driver/executor-shared evaluation of the pushed-down filter subset.
  * Supported: =, <, <=, >, >=, IS NULL, IS NOT NULL on a top-level
  * column of long/int/double/string type with a literal of matching
  * type. Comparison NULL semantics match SQL: a comparison on a null
  * cell is NOT satisfied. */
object GraftFilterEval {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  // EXACT name match only: Spark pushes filters with the column name as
  // the analyzer resolved it against this very schema, so exact always
  // hits for legitimate pushes — and under spark.sql.caseSensitive=true
  // a case-insensitive fallback could bind a TRUSTED predicate to the
  // wrong column of a case-colliding schema (silent wrong results; a
  // rejected push merely stays a residual filter, which is safe).
  private def ordinalOf(schema: StructType, col: String): Int =
    schema.fieldNames.indexOf(col)

  private def comparable(schema: StructType, col: String, v: Any): Boolean = {
    val o = ordinalOf(schema, col)
    o >= 0 && ((schema.fields(o).dataType, v) match {
      case (LongType, _: Long) | (IntegerType, _: Int) |
           (DoubleType, _: Double) | (StringType, _: String) => true
      case _ => false
    })
  }

  def supports(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(c, v) => comparable(schema, c, v)
    case GreaterThan(c, v) => comparable(schema, c, v)
    case GreaterThanOrEqual(c, v) => comparable(schema, c, v)
    case LessThan(c, v) => comparable(schema, c, v)
    case LessThanOrEqual(c, v) => comparable(schema, c, v)
    case IsNull(c) => ordinalOf(schema, c) >= 0
    case IsNotNull(c) => ordinalOf(schema, c) >= 0
    case _ => false
  }

  /** Comparison predicate with the ordinal and literal resolved ONCE —
    * the reader calls the returned closure per row, so no per-row name
    * lookup or boxing. A null cell never satisfies a comparison. */
  private def cmpPred(schema: StructType, col: String, v: Any,
      test: Int => Boolean): InternalRow => Boolean = {
    val o = ordinalOf(schema, col)
    schema.fields(o).dataType match {
      case LongType =>
        val lv = v.asInstanceOf[Long]
        r => !r.isNullAt(o) && test(java.lang.Long.compare(r.getLong(o), lv))
      case IntegerType =>
        val iv = v.asInstanceOf[Int]
        r => !r.isNullAt(o) && test(Integer.compare(r.getInt(o), iv))
      case DoubleType =>
        val dv = v.asInstanceOf[Double]
        // Spark's double ordering (SQLOrderingUtil): primitive == first,
        // so -0.0 = 0.0 holds — java.lang.Double.compare alone would
        // order them and silently drop rows from trusted filters
        r => !r.isNullAt(o) && {
          val x = r.getDouble(o)
          test(if (x == dv) 0 else java.lang.Double.compare(x, dv))
        }
      case StringType =>
        val sv = org.apache.spark.unsafe.types.UTF8String.fromString(
          v.asInstanceOf[String])
        r => !r.isNullAt(o) && test(r.getUTF8String(o).compareTo(sv))
      case other =>
        throw new IllegalStateException(s"unsupported pushdown type $other")
    }
  }

  /** Compile an ACCEPTED filter to a per-row predicate. */
  def compile(schema: StructType, f: Filter): InternalRow => Boolean = f match {
    case EqualTo(c, v) => cmpPred(schema, c, v, _ == 0)
    case GreaterThan(c, v) => cmpPred(schema, c, v, _ > 0)
    case GreaterThanOrEqual(c, v) => cmpPred(schema, c, v, _ >= 0)
    case LessThan(c, v) => cmpPred(schema, c, v, _ < 0)
    case LessThanOrEqual(c, v) => cmpPred(schema, c, v, _ <= 0)
    case IsNull(c) =>
      val o = ordinalOf(schema, c); r => r.isNullAt(o)
    case IsNotNull(c) =>
      val o = ordinalOf(schema, c); r => !r.isNullAt(o)
    case other => throw new IllegalStateException(s"unaccepted filter $other")
  }
}

/** Scan over the snapshot captured at plan time. One input partition
  * per stored batch (batches are the units appends/commits arrived in),
  * rows shipped inside the serialized partition — UnsafeRow is
  * Externalizable, so the transport is exact. `pruneTo` carries the
  * pushed-column ordinals into the readers. */
class GraftScan(tableSchema: StructType, requiredSchema: StructType,
    pruneTo: Option[Array[Int]],
    filters: Array[org.apache.spark.sql.sources.Filter],
    snapshot: Array[Array[UnsafeRow]])
    extends Scan with Batch {
  def this(schema: StructType, snapshot: Array[Array[UnsafeRow]]) =
    this(schema, schema, None, Array.empty, snapshot)
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    if (snapshot.isEmpty) Array(GraftInputPartition(Array.empty))
    else snapshot.map(b => GraftInputPartition(b): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(tableSchema, pruneTo, filters)
  override def description(): String =
    s"GraftScan(${snapshot.map(_.length).sum} rows, " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${requiredSchema.catalogString})"
}

case class GraftInputPartition(rows: Array[UnsafeRow]) extends InputPartition

class GraftReaderFactory(tableSchema: StructType,
    pruneTo: Option[Array[Int]],
    filters: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val proj: InternalRow => InternalRow = pruneTo match {
        case None => identity
        case Some(ords) =>
          val exprs = ords.map(o =>
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              o, tableSchema.fields(o).dataType, nullable = true))
          val u = UnsafeProjection.create(exprs.toIndexedSeq)
          r => u(r)
      }
      private val preds = filters.map(GraftFilterEval.compile(tableSchema, _))
      private def keep(r: InternalRow): Boolean = preds.forall(_(r))
      private val it = p.asInstanceOf[GraftInputPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (it.hasNext) {
          val raw = it.next()
          if (keep(raw)) { cur = proj(raw); return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

/** Writers UnsafeProjection-copy incoming rows and return them in the
  * commit message; commit() swaps (replace) or appends the batches on
  * the driver. Row volume is bounded by the table being an in-memory
  * demo table — the parquet-backed variant would commit file lists, not
  * rows (the standard DSv2 contract; only the commit payload changes). */
class GraftWriteBuilder(table: GraftTable, incoming: StructType, replace: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = replace
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new GraftWriterFactory(incoming, table.schema())
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val batches = messages.collect {
          case m: GraftCommit if m.rows.nonEmpty => m.rows
        }
        if (truncateFirst) table.replaceRows(batches)
        else table.appendRows(batches)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
    /** Streaming sink (`writeStream.toTable`): per-epoch append with
      * EPOCH-ID DEDUP — Spark re-runs an epoch whose sink commit raced
      * a crash (the offset log has it, the sink may or may not), so the
      * sink must treat commit(epoch, _) idempotently. Epochs at or
      * below the high-water mark are dropped whole; the batches of an
      * accepted epoch land atomically under the table lock. This is the
      * same contract q141 implements with versioned directories, here
      * at the DSv2 seam. */
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
        override def createStreamingWriterFactory(
            info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
          new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
            private val inner = new GraftWriterFactory(incoming, table.schema())
            override def createWriter(partitionId: Int, taskId: Long,
                epochId: Long): DataWriter[InternalRow] =
              inner.createWriter(partitionId, taskId)
          }
        override def commit(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit =
          table.synchronized {
            if (epochId > table.lastCommittedEpoch) {
              val batches = messages.collect {
                case m: GraftCommit if m.rows.nonEmpty => m.rows
              }
              table.appendRows(batches)
              table.lastCommittedEpoch = epochId
            }
          }
        override def abort(epochId: Long,
            messages: Array[WriterCommitMessage]): Unit = ()
      }
    override def description(): String =
      s"GraftWrite(${table.name()}, replace=$truncateFirst)"
  }
}

case class GraftCommit(rows: Array[UnsafeRow]) extends WriterCommitMessage

/** Projects each incoming physical row into TABLE-schema layout.
  *
  * Columns are resolved BY NAME against the write's logical schema (the
  * write query's order need not be the storage order), and physical rows
  * may carry ONE extra leading column the logical schema doesn't
  * mention: Spark 4.1's unified row-level rewrite emits
  * `Project [<op> AS __row_operation, <data cols>]` under ReplaceData,
  * and `ReplaceDataExec.writingTask` applies the stripping rowProjection
  * only on the metadata path (`DataAndMetadataWritingSparkTask`) — a
  * group-based operation with no metadata attributes receives the marker
  * column attached. The offset handling below strips it; the bound is
  * validated per batch (offset must be 0 or 1, layout must not change
  * mid-write), and GraftCatalogSpec pins both the rewrite's plan shape
  * (leading `__row_operation`) and end-state equality with the
  * DataFrame-side merge, so a Spark upgrade that changes the contract
  * fails loudly instead of corrupting storage. */
class GraftWriterFactory(incoming: StructType, target: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var proj: UnsafeProjection = _
      private var projFields = -1
      private def projFor(row: InternalRow): UnsafeProjection = {
        if (proj == null) {
          val offset = row.numFields - incoming.size
          require(offset == 0 || offset == 1,
            s"row has ${row.numFields} fields for write schema " +
              s"${incoming.catalogString} — unknown physical layout")
          val exprs = target.fields.map { f =>
            val idx = incoming.fieldNames.indexWhere(_.equalsIgnoreCase(f.name))
            require(idx >= 0, s"write schema ${incoming.catalogString} " +
              s"is missing table column ${f.name} of ${target.catalogString}")
            org.apache.spark.sql.catalyst.expressions.BoundReference(
              offset + idx, incoming.fields(idx).dataType, nullable = true)
          }
          proj = UnsafeProjection.create(exprs.toIndexedSeq)
          projFields = row.numFields
        }
        require(row.numFields == projFields,
          s"row layout changed mid-write: $projFields -> ${row.numFields}")
        proj
      }
      private val buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
      override def write(row: InternalRow): Unit =
        buf += projFor(row)(row).copy()
      override def commit(): WriterCommitMessage = GraftCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
