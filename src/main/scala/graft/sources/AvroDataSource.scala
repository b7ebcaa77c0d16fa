package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 face over [[AvroIo]]'s split/decode machinery, so the
  * Avro scan lives INSIDE the planner's audit regime instead of behind
  * an opaque `ExistingRDD`: `explain` shows a named `GraftAvroScan`
  * with its projected columns, Catalyst prunes the reader schema
  * through `SupportsPushDownRequiredColumns` (a `.select` above the
  * scan makes Avro's resolving decoder SKIP the unprojected bytes —
  * no explicit `columns` parameter needed), split sizing follows
  * `spark.sql.files.maxPartitionBytes` at PLAN time like every file
  * source, per-scan input metrics appear in the UI, and the scan
  * reports its byte size so join-side broadcast decisions see real
  * numbers.
  *
  * Read through [[AvroIo.readAvro]] (which routes here) or directly:
  * `spark.read.format("graft-avro").load(dir)`. Options:
  * `conflicts` = drop|stringify (irreconcilable generation re-types),
  * `maxSplitBytes` = sub-file split size override. */
final class AvroDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-avro: no path given")
    p
  }

  private def conflicts(options: CaseInsensitiveStringMap): PsIO.ConflictPolicy =
    options.getOrDefault(AvroDataSource.ConflictsOption, "drop") match {
      case "drop"      => PsIO.DropConflicts
      case "stringify" => PsIO.StringifyConflicts
      case other => throw new IllegalArgumentException(
        s"graft-avro: unknown conflicts policy '$other' (drop|stringify)")
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroIo.planRead(SparkSession.active, path(options), conflicts(options)).unified

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AvroTable(path(opts), conflicts(opts),
      Option(opts.get(AvroDataSource.SplitOption)).map(_.toLong), schema)
  }
}

object AvroDataSource {
  val ConflictsOption = "conflicts"
  val SplitOption = "maxSplitBytes"
}

private[sources] final class AvroTable(
    path: String, conflicts: PsIO.ConflictPolicy,
    maxSplitBytes: Option[Long], tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro $path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, conflicts, maxSplitBytes, tableSchema)
}

private[sources] final class AvroScanBuilder(
    path: String, conflicts: PsIO.ConflictPolicy,
    maxSplitBytes: Option[Long], full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  // Catalyst hands back the pruned subset of the full schema (possibly
  // reordered); empty pruning (count-only scans) keeps the narrowest
  // column (by Catalyst defaultSize — an int/long over a nested payload
  // blob) so each record still decodes exactly once at minimal cost
  override def pruneColumns(requiredSchema: StructType): Unit =
    required =
      if (requiredSchema.isEmpty && full.nonEmpty)
        StructType(Seq(full.fields.minBy(_.dataType.defaultSize)))
      else requiredSchema
  override def build(): Scan =
    new AvroScan(path, conflicts, maxSplitBytes, required)
}

private[sources] final class AvroScan(
    path: String, conflicts: PsIO.ConflictPolicy,
    maxSplitBytes: Option[Long], required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  // planned once per scan, driver-side; the header job behind planRead
  // is session-cached, so re-planning an unchanged directory is
  // metadata-only
  private lazy val plan = AvroIo.planRead(SparkSession.active, path, conflicts)

  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftAvroScan $path columns=[${required.fieldNames.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val splitBytes = maxSplitBytes.getOrElse(SQLConf.get.filesMaxPartitionBytes)
    AvroIo.computeSplits(plan, splitBytes).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroPartitionReaderFactory(plan.genJsons, required,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(plan.files.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[sources] final class AvroPartitionReaderFactory(
    genJsons: Array[String], target: StructType,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[AvroIo.AvroSplit]
    val rows = new AvroIo.SplitRows(sp, genJsons(sp.schemaIdx), target, conf)
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(target)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = toCatalyst(rows.next()).asInstanceOf[InternalRow]; true }
        else false
      override def get(): InternalRow = cur
      override def close(): Unit = rows.close()
    }
  }
}
