package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro Object Container File ingest/egress — the remaining row-major
  * interchange format of the ingest tier (CSV q104, JSONL q105, ORC
  * q129, WARC q267, archives q210/q220). Uses the upstream Avro Java
  * library already on Spark's classpath (`/opt/spark/jars/avro-*.jar`,
  * the same dependency Spark's own avro functions ride); the engine
  * work is the distributed plumbing: one container per task on write,
  * one task per container on read, schema mapped between Catalyst and
  * Avro with nullable fields as `["null", T]` unions.
  *
  * Scale shape: a container is a self-describing unit (schema in the
  * header, sync-marked blocks), so read parallelism is per-file — the
  * layout compaction (q268) and admission control (q275) stories apply
  * unchanged. Deflate codec by default: splittable-enough at the file
  * grain this lake uses, and dependency-free. */
object AvroIngest {

  private val Supported: Set[DataType] =
    Set(LongType, DoubleType, StringType, BooleanType)

  /** Catalyst -> Avro schema (subset: long/double/string/boolean,
    * nullable as a null union). Built as JSON to keep the mapping
    * explicit and greppable. */
  def avroSchemaJson(schema: StructType, name: String = "record0"): String = {
    val fields = schema.fields.map { f =>
      require(Supported.contains(f.dataType),
        s"avro ingest: unsupported type ${f.dataType} for '${f.name}' " +
          "(supported: long/double/string/boolean)")
      val t = f.dataType match {
        case LongType => "\"long\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case BooleanType => "\"boolean\""
        case _ => throw new IllegalStateException("unreachable")
      }
      val tt = if (f.nullable) s"""["null", $t]""" else t
      s"""{"name": "${f.name}", "type": $tt""" +
        (if (f.nullable) ""","default": null}""" else "}")
    }
    s"""{"type": "record", "name": "$name", "fields": [${fields.mkString(", ")}]}"""
  }

  /** Write `df` as Avro containers under `path`, one file per task
    * (`part-<pid>.avro`). Returns the number of files written. */
  def writeContainers(df: DataFrame, path: String,
      deflateLevel: Int = 6): Int = {
    val schema = df.schema
    val json = avroSchemaJson(schema)
    val spark = df.sparkSession
    val confProps = spark.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    val n = df.rdd.getNumPartitions
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val avroSchema = new org.apache.avro.Schema.Parser().parse(json)
      val c = new org.apache.hadoop.conf.Configuration(false)
      confProps.foreach { case (k, v) => c.set(k, v) }
      val p = new Path(path, f"part-$pid%05d.avro")
      val fs = p.getFileSystem(c)
      fs.mkdirs(p.getParent)
      val out = fs.create(p, true)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(deflateLevel))
      w.create(avroSchema, out)
      try rows.foreach { r =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, if (r.isNullAt(i)) null else f.dataType match {
            case LongType => java.lang.Long.valueOf(r.getLong(i))
            case DoubleType => java.lang.Double.valueOf(r.getDouble(i))
            case StringType => r.getString(i)
            case BooleanType => java.lang.Boolean.valueOf(r.getBoolean(i))
            case _ => throw new IllegalStateException("unreachable")
          })
        }
        w.append(rec)
      } finally w.close()
    }
    n
  }

  /** Read every `.avro` container under `path` as a DataFrame with
    * `schema` (names resolved against each container's own header
    * schema — a missing nullable field reads as null, a missing
    * non-nullable one fails). One task per container. */
  def readContainers(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    schema.fields.foreach(f => require(Supported.contains(f.dataType),
      s"avro ingest: unsupported type ${f.dataType} for '${f.name}'"))
    val confProps = spark.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toMap
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(dir).filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".avro")).sorted.toSeq
    val fieldNames = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    val nullables = schema.fields.map(_.nullable)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { file =>
        val c = new org.apache.hadoop.conf.Configuration(false)
        confProps.foreach { case (k, v) => c.set(k, v) }
        val p = new Path(file)
        val f = p.getFileSystem(c)
        val in = f.open(p)
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        in.close()
        val reader = new org.apache.avro.file.DataFileReader(
          new org.apache.avro.file.SeekableByteArrayInput(bytes.toByteArray),
          new org.apache.avro.generic.GenericDatumReader[
            org.apache.avro.generic.GenericRecord]())
        val hdr = reader.getSchema
        fieldNames.zip(nullables).foreach { case (fn, nullable) =>
          require(hdr.getField(fn) != null || nullable,
            s"avro ingest: non-nullable '$fn' absent from $file " +
              s"(container schema: $hdr)")
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fieldNames.zip(types).map { case (fn, dt) =>
              val v = if (hdr.getField(fn) == null) null else rec.get(fn)
              (v, dt) match {
                case (null, _) => null
                case (x: java.lang.Long, LongType) => x
                case (x: java.lang.Double, DoubleType) => x
                case (x: java.lang.Boolean, BooleanType) => x
                case (x: org.apache.avro.util.Utf8, StringType) => x.toString
                case (x: String, StringType) => x
                case (x, dt2) => throw new java.io.IOException(
                  s"avro ingest: '$fn' holds ${x.getClass.getName}, " +
                    s"expected $dt2")
              }
            }.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
