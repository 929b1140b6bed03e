package graft.schema

import org.apache.spark.sql.types._

/** Source-type -> Spark type mapping.
  *
  * The reference discovers {field -> airtable type string} at runtime from a
  * metadata API (reference: lib/AirtableDataFetcher.py:39-63) and converts
  * values per type (reference: lib/DataProcessor.py:40-63). Here the same
  * mapping produces a `StructType` once, and the casts compile to Catalyst
  * expressions instead of per-record Python dispatch.
  *
  * All fields are nullable: the source omits empty fields, so rows are
  * sparse (reference: lib/UpdateStrategies.py:368-372).
  */
object SchemaMapper {

  /** Unknown types default to string (reference: lib/DataProcessor.py:31). */
  val DefaultType = "singleLineText"

  def toDataType(sourceType: String): DataType = sourceType match {
    case "singleLineText" | "multilineText" => StringType
    case "number" => DoubleType // all numbers become double (reference: lib/DataProcessor.py:46-47)
    case "checkbox" => BooleanType
    case "date" => DateType
    case "dateTime" => TimestampType
    case "multipleAttachments" => ArrayType(StringType) // urls only (reference: lib/DataProcessor.py:58-59)
    case "multipleSelects" => ArrayType(StringType)
    // engine extension beyond the reference's type set: numeric vectors
    // (embeddings) as a first-class lake column
    case "numberArray" => ArrayType(DoubleType)
    case _ => StringType // pass-through arm (reference: lib/DataProcessor.py:62-63)
  }

  /** Build a nullable StructType from a discovered field-type map.
    * Field order is the insertion order of `fieldTypes` when it is a
    * ListMap, otherwise sorted for determinism. */
  def toStructType(fieldTypes: Map[String, String]): StructType =
    StructType(fieldTypes.toSeq.sortBy(_._1).map { case (name, t) =>
      StructField(name, toDataType(t), nullable = true)
    })
}
