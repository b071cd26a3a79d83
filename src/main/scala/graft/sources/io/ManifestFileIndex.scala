package graft.sources.io

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BoundReference, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] backed by an explicit manifest — the file list and each
  * file's partition values come from a table-format transaction log (Delta
  * add actions, …), never from listing the filesystem.
  *
  * This is the listing-table shape the reference builds for Delta scans
  * (`beacon-delta` hands DataFusion a pre-resolved file list with partition
  * columns; `beacon-datafusion-ext/src/listing_factory.rs`): the query plan
  * is ONE relation regardless of partition count, and partition predicates
  * prune in-memory against the manifest — no per-partition plan branches,
  * no directory walks. A 10k-partition table plans in O(1) plan nodes and
  * O(#partitions) driver work inside `listFiles`, not O(#partitions)
  * Catalyst tree nodes.
  *
  * File sizes must be real (they come from the log): Spark splits scan
  * tasks by `FileStatus.getLen`, so a wrong size would truncate reads.
  */
final class ManifestFileIndex(
    root: Path,
    override val partitionSchema: StructType,
    groups: Seq[(InternalRow, Seq[ManifestFileIndex.Entry])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) groups
      else {
        val bound = partitionFilters.reduce(And).transform {
          case a: Attribute =>
            val idx = partitionSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
            require(idx >= 0, s"partition filter on unknown column ${a.name}")
            BoundReference(idx, partitionSchema(idx).dataType, nullable = true)
        }
        val predicate = Predicate.createInterpreted(bound)
        predicate.initialize(0)
        groups.filter { case (values, _) => predicate.eval(values) }
      }
    selected.map { case (values, files) =>
      PartitionDirectory(values, files.map(_.toFileStatus).toArray)
    }
  }

  override def inputFiles: Array[String] =
    groups.iterator.flatMap(_._2.iterator.map(_.path)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    groups.iterator.flatMap(_._2.iterator.map(_.size)).sum
}

object ManifestFileIndex {

  /** one data file: absolute path (any Hadoop scheme), real byte size,
    * log-recorded modification time */
  final case class Entry(path: String, size: Long, modificationTime: Long) {
    def toFileStatus: FileStatus =
      new FileStatus(size, false, 1, 128L * 1024 * 1024, modificationTime, new Path(path))
  }

  /** Decode a table-format partition-value string to the Catalyst value of
    * `dt` (Delta serializes every partition value as a string; dates,
    * timestamps and numerics follow SQL literal syntax — a LEGACY-mode
    * Cast is exactly that decoder). */
  def decodePartitionValue(raw: String, dt: DataType, timeZoneId: String): Any =
    if (raw == null) null
    else Cast(Literal(UTF8String.fromString(raw), StringType), dt, Some(timeZoneId)).eval(null)

  /** group entries by their raw partition-value tuple and decode each
    * distinct tuple to an [[InternalRow]] once */
  def group(
      partitionSchema: StructType,
      entries: Seq[(Map[String, String], Entry)],
      timeZoneId: String): Seq[(InternalRow, Seq[Entry])] =
    entries.groupBy(_._1).toSeq.map { case (pv, es) =>
      val row = InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
        decodePartitionValue(pv.getOrElse(f.name, null), f.dataType, timeZoneId)
      })
      row -> es.map(_._2)
    }
}
