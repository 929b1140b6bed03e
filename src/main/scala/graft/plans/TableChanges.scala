package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `table_changes(...)` — the change feed as a SQL table-valued
  * function, so the SQL surface consumes snapshot deltas without
  * dropping to Scala (the Delta-style `TABLE_CHANGES` entry point over
  * this lake's `cdc=true` read):
  *
  * {{{
  * SELECT * FROM table_changes('cat.ns.t', 1, 3)         -- catalog table
  * SELECT * FROM table_changes('cat.ns.t', 1)            -- ... to head
  * SELECT * FROM table_changes('/lake/t', 'A:number', 0, 2) -- path-addressed
  * }}}
  *
  * Output = the table's columns plus the signed multiplicity `m`
  * (+1 insert, −1 delete) — [[graft.sources.v2.RecordCdc]]'s batch
  * window, exactly the rows the DataFrame option surface
  * (`cdc=true, startingVersion, endingVersion`) returns. Catalog-form
  * resolution loads the table to inherit its path, field types, rename
  * lineage (`formerNames`), and data format, so the TVF tracks ALTER
  * TABLE history with no extra arguments. Registered by
  * [[graft.GraftExtensions]] via `injectTableFunction`. */
object TableChanges {

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be a string literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"table_changes: $what must be an integer literal, got $other")
  }

  private def isNumeric(e: Expression): Boolean = e match {
    case Literal(_, IntegerType | LongType) => true
    case _ => false
  }

  def plan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    // (table, from [, to])  |  (path, fieldTypes, from [, to])
    val catalogForm = args.length match {
      case 2 => true
      case 3 => isNumeric(args(1))
      case 4 => false
      case n => throw new IllegalArgumentException(
        s"table_changes takes (table, from[, to]) or (path, fieldTypes, " +
          s"from[, to]) — got $n arguments")
    }
    val (opts, fromV, toV) =
      if (catalogForm) {
        val name = strLit(args.head, "table name")
        val parts = try
          spark.sessionState.sqlParser.parseMultipartIdentifier(name)
        catch {
          case scala.util.control.NonFatal(_) =>
            throw new IllegalArgumentException(
              s"table_changes: '$name' is not a catalog-qualified table " +
                "name — for a path-addressed lake use " +
                "table_changes(path, fieldTypes, from[, to])")
        }
        require(parts.length >= 2,
          s"table_changes: '$name' must be a catalog-qualified name " +
            "(cat.ns.t) — use the (path, fieldTypes, from, to) form for " +
            "path-addressed lakes")
        val cat = spark.sessionState.catalogManager.catalog(parts.head) match {
          case t: TableCatalog => t
          case other => throw new IllegalArgumentException(
            s"table_changes: catalog '${parts.head}' is not a table " +
              s"catalog: $other")
        }
        val tbl = cat.loadTable(
          Identifier.of(parts.drop(1).dropRight(1).toArray, parts.last))
        import scala.jdk.CollectionConverters._
        val props = tbl.properties().asScala
        val inherit = Seq("path", "fieldTypes", "formerNames", "dataFormat")
          .flatMap(k => props.get(k).map(k -> _)).toMap
        require(inherit.contains("path"),
          s"table_changes: '$name' is not a graft-records table " +
            "(no path property)")
        (inherit, longLit(args(1), "fromVersion"),
          args.lift(2).map(longLit(_, "toVersion")))
      } else {
        (Map(
          "path" -> strLit(args.head, "path"),
          "fieldTypes" -> strLit(args(1), "fieldTypes")),
          longLit(args(2), "fromVersion"),
          args.lift(3).map(longLit(_, "toVersion")))
      }
    var r = spark.read.format("graft-records")
      .options(opts)
      .option("cdc", "true")
      .option("startingVersion", fromV.toString)
    toV.foreach(v => r = r.option("endingVersion", v.toString))
    r.load().queryExecution.logical
  }
}
