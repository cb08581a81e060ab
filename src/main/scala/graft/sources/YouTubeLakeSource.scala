package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** S1 (stretch, SURVEY §2.1): a REAL `DataSourceV2` `TableProvider` for the
  * raw YouTube day lake — `spark.read.format("graft-youtube").load(lakeRoot)`.
  *
  * The reference's "source" is a driver-side REST fetch
  * (dags/trending_daily_ingestion.py:75-91) whose payload lands in the lake;
  * graft's Spark-native form reads that lake as a first-class table:
  *
  *   - PARTITION PLANNING: one [[InputPartition]] per day FILE (a day object
  *     is one file by [[graft.ingest.Lake]] construction), so a backfill
  *     over N days reads N files in parallel with no driver bottleneck;
  *   - SCHEMA: `(ingest_date DATE, region STRING, payload STRING)` — one row
  *     per region RESPONSE. The source stays deliberately thin: splitting
  *     the region-keyed object is bounded work (|regions| map entries), and
  *     the heavy nested parse stays in Catalyst via
  *     `from_json(payload, Schemas.responseSchema)` — declared-schema,
  *     codegen'd, column-pruned. A source that re-implemented the JSON→row
  *     conversion would just be a slower copy of Spark's JSON reader;
  *   - skip-if-absent (reference :155) falls out: a region missing from the
  *     day object emits no row.
  *
  * Layout accepted under the load path: `date=YYYY-MM-DD/` day directories
  * ([[graft.ingest.Lake]] layout; non-hidden files inside) and/or bare
  * `YYYY-MM-DD.json` files (the reference's object naming, :88).
  */
class YouTubeLakeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-youtube"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    YouTubeLakeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-youtube: .load(path) is required"))
    new YouTubeLakeTable(path)
  }
}

object YouTubeLakeSource {
  val schema: StructType = new StructType()
    .add("ingest_date", DataTypes.DateType)
    .add("region", DataTypes.StringType)
    .add("payload", DataTypes.StringType)

  private val DayDir = "date=(\\d{4}-\\d{2}-\\d{2})".r
  private val DayFile = "(\\d{4}-\\d{2}-\\d{2})\\.json".r

  /** (epochDay, file) pairs for every day data file under `root`. */
  private[sources] def listDayFiles(root: String, conf: Configuration): Seq[(Int, String)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    def dataFiles(dir: Path): Seq[FileStatus] =
      fs.listStatus(dir).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && f.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
      }
    fs.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case DayDir(d) if st.isDirectory =>
          val day = java.time.LocalDate.parse(d).toEpochDay.toInt
          dataFiles(st.getPath).map(f => day -> f.getPath.toString)
        case DayFile(d) if st.isFile =>
          Seq(java.time.LocalDate.parse(d).toEpochDay.toInt -> st.getPath.toString)
        case _ => Seq.empty
      }
    }.sortBy(identity)
  }
}

private class YouTubeLakeTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-youtube(`$path`)"
  override def schema(): StructType = YouTubeLakeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = YouTubeLakeSource.schema
      override def toBatch: Batch = this
      // The SESSION's Hadoop conf, not a bare `new Configuration()`: lake
      // roots on object stores carry their credentials/endpoints in
      // spark.hadoop.* — dropping them would break exactly the deployment
      // this source exists for. Captured ONCE at scan build (a val): the
      // active-session thread-local is only guaranteed here, and planning
      // and reader-factory creation must see the same snapshot.
      private val hadoopConf =
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
      override def planInputPartitions(): Array[InputPartition] =
        YouTubeLakeSource.listDayFiles(path, hadoopConf)
          .map { case (day, file) => DayFilePartition(day, file): InputPartition }
          .toArray
      override def createReaderFactory(): PartitionReaderFactory =
        DayFileReaderFactory(new SerializableConfiguration(hadoopConf))
    }
}

/** One raw day file — the unit of read parallelism. */
private case class DayFilePartition(epochDay: Int, file: String) extends InputPartition

private case class DayFileReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DayFilePartition]
    new PartitionReader[InternalRow] {
      // Executor-side: read the whole day object (one bounded file), split
      // by top-level region key, emit (date, region, region-subtree JSON).
      private val rows: Iterator[InternalRow] = {
        val hp = new Path(p.file)
        val in = hp.getFileSystem(conf.value).open(hp)
        val bytes = try in.readAllBytes() finally in.close()
        val root = new ObjectMapper().readTree(bytes)
        root.fieldNames().asScala.map { k =>
          InternalRow(p.epochDay,
            UTF8String.fromString(k),
            UTF8String.fromString(root.get(k).toString))
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
