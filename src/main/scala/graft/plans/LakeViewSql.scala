package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import com.fasterxml.jackson.databind.ObjectMapper

/** The maintained-materialized-view surface ([[graft.operators.LakeView]])
  * in SQL `FROM` position — the same injection pattern as
  * [[TableChanges]], so a SQL-only user can define, advance, and read an
  * incrementally-maintained view without dropping to Scala:
  *
  * {{{
  * -- define (persists _view.json at the view path; idempotent)
  * SELECT * FROM create_lake_view('/v', 'aggregate',
  *   '/lake/t', 'K:singleLineText,X:number', 'K', 'X', 'X')
  * SELECT * FROM create_lake_view('/v', 'join',
  *   '/lake/l', 'K:number,A:number', 'K,A',
  *   '/lake/r', 'K:number,B:singleLineText', 'K,B', 'K')
  * -- advance to the tables' newest snapshots (∝-delta, like the Scala
  * -- API); returns the consumed windows + the folded delta size
  * SELECT * FROM refresh_lake_view('/v')
  * -- read the maintained state (optionally a specific live generation
  * -- — view-level time travel, retention keeps current + previous)
  * SELECT * FROM lake_view('/v')
  * SELECT * FROM lake_view('/v', 3)
  * }}}
  *
  * The DEFINITION is durable (`_view.json` beside the generation
  * pointers — LakeView's retention never touches non-pointer files), so
  * `refresh_lake_view` needs only the path: the aggregate form records
  * (table, fieldTypes, keys, sums, minMax), the join form records both
  * sides' (path, fieldTypes, cols) plus keys and the stateBuckets pin,
  * the COMPOSED form (`'join_aggregate'` — a maintained aggregate
  * over a maintained join, [[graft.operators.LakeView.refreshJoinAggregate]])
  * records both, and the THREE-TABLE form (`'join3'` — a chained star
  * join, [[graft.operators.LakeView.refreshJoin3]]) records all three
  * sides plus both key lists. Column lists are comma-separated; '' = none; a sums
  * entry may be `alias:expr` for a derived-column sum (expression
  * commas inside parentheses are respected). `create_lake_view` is
  * idempotent on an IDENTICAL definition and refuses a conflicting one
  * (a silent redefinition would desync the persisted state from the
  * fold rules that built it).
  *
  * `create_lake_view`/`drop_lake_view`/`refresh_lake_view` resolve to
  * proper Catalyst COMMANDS ([[LakeCommand]]): executing the statement
  * runs the work exactly once (`spark.sql(...)` executes commands
  * eagerly — no caller change), while `EXPLAIN` is INERT — it prints
  * the plan and advances no watermark, writes no definition (the
  * `EXPLAIN INSERT` contract). Definition loading and argument-shape
  * validation stay at analysis, like a missing table. The refresh
  * returns one row: (kind, from_left, to_left, from_right, to_right,
  * changed, from_third, to_third); aggregate-shaped views report their
  * single window in the left slots with NULL rights, and only 'join3'
  * fills the appended third-table slots. */
object LakeViewSql {

  private val DefName = "_view.json"

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case Literal(null, _) => throw new IllegalArgumentException(
      s"lake_view: $what must be a string literal, got NULL")
    case other => throw new IllegalArgumentException(
      s"lake_view: $what must be a string literal, got $other")
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"lake_view: $what must be an integer literal, got $other")
  }

  private def cols(s: String): Seq[String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Split a sums list on TOP-LEVEL commas only: a derived-column entry
    * (`rev:CAST(Price AS DECIMAL(18,2))`) legitimately contains commas
    * inside parentheses. SQL string literals are opaque to the scan —
    * a quoted `','`, `'('`, or `')'` is expression content, not
    * structure (a doubled `''` inside a literal is the standard escape
    * and stays inside it). Unbalanced parentheses or an unterminated
    * literal refuse loudly instead of silently misparsing the persisted
    * fold rules. */
  private[plans] def sumSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    var escaped = false
    s.foreach { c =>
      if (inQuote) {
        // Spark's default (non-ANSI) parser honors backslash escapes
        // inside string literals ('it\'s'), and '' re-enters a literal
        // immediately — both must stay INSIDE the quote state
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '\'') inQuote = false
        cur.append(c)
      } else c match {
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case c2 =>
          if (c2 == '\'') inQuote = true
          else if (c2 == '(') depth += 1
          else if (c2 == ')') {
            depth -= 1
            require(depth >= 0,
              s"lake_view: unbalanced ')' in sums list: $s")
          }
          cur.append(c2)
      }
    }
    require(!inQuote, s"lake_view: unterminated string literal in sums list: $s")
    require(depth == 0, s"lake_view: unbalanced '(' in sums list: $s")
    out += cur.result()
    out.iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  // ---- create_lake_view -------------------------------------------------

  private val createSchema = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("created", BooleanType, nullable = false)))

  def createPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2, "create_lake_view(viewPath, kind, ...)")
    val viewPath = strLit(args.head, "viewPath")
    val kind = strLit(args(1), "kind")
    val mapper = new ObjectMapper()
    val def_ = mapper.createObjectNode()
    def_.put("kind", kind)
    def putList(field: String, v: Seq[String]): Unit = {
      val a = def_.putArray(field); v.foreach(a.add)
    }
    kind match {
      case "aggregate" =>
        require(args.length >= 6 && args.length <= 12,
          "create_lake_view(viewPath, 'aggregate', tablePath, fieldTypes, " +
            "keys, sums[, minMax[, filter[, stateBuckets[, distincts" +
            "[, topks[, hists]]]]]]) " +
            "— comma-separated column lists; a sums entry may be " +
            "`alias:expr` for a derived-column sum; filter is a SQL " +
            "predicate ('' = none); distincts maintains exact per-group " +
            "COUNT(DISTINCT col) as dc_<col>; a topks entry is `col:k` " +
            "and maintains the k largest distinct values as tk_<col>; a " +
            "hists entry is `col:lo:hi:bins` and maintains an ADDITIVE " +
            "per-group histogram as hs_<col> (underflow + bins + " +
            "overflow counts — invertible under deletes, no rescan)")
        def_.put("table", strLit(args(2), "tablePath"))
        def_.put("fieldTypes", strLit(args(3), "fieldTypes"))
        putList("keys", cols(strLit(args(4), "keys")))
        putList("sums", sumSpecs(strLit(args(5), "sums")))
        putList("minMax",
          args.lift(6).map(a => cols(strLit(a, "minMax"))).getOrElse(Nil))
        args.lift(7).map(strLit(_, "filter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("filter", _))
        def_.put("stateBuckets",
          args.lift(8).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
        putList("distincts",
          args.lift(9).map(a => cols(strLit(a, "distincts"))).getOrElse(Nil))
        putList("topks",
          args.lift(10).map(a => cols(strLit(a, "topks"))).getOrElse(Nil))
        putList("hists",
          args.lift(11).map(a => cols(strLit(a, "hists"))).getOrElse(Nil))
      case "aggregate_over_view" =>
        require(args.length >= 5 && args.length <= 11,
          "create_lake_view(viewPath, 'aggregate_over_view', " +
            "sourceViewPath, keys, sums[, minMax[, filter" +
            "[, stateBuckets[, distincts[, topks[, hists]]]]]]) — an " +
            "aggregate maintained over ANOTHER maintained view's " +
            "generation feed; refresh the source first; a topks entry " +
            "is `col:k`, a hists entry `col:lo:hi:bins`")
        def_.put("source", strLit(args(2), "sourceViewPath"))
        putList("keys", cols(strLit(args(3), "keys")))
        putList("sums", sumSpecs(strLit(args(4), "sums")))
        putList("minMax",
          args.lift(5).map(a => cols(strLit(a, "minMax"))).getOrElse(Nil))
        args.lift(6).map(strLit(_, "filter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("filter", _))
        def_.put("stateBuckets",
          args.lift(7).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
        putList("distincts",
          args.lift(8).map(a => cols(strLit(a, "distincts"))).getOrElse(Nil))
        putList("topks",
          args.lift(9).map(a => cols(strLit(a, "topks"))).getOrElse(Nil))
        putList("hists",
          args.lift(10).map(a => cols(strLit(a, "hists"))).getOrElse(Nil))
      case "join_of_views" =>
        require(args.length >= 7 && args.length <= 10,
          "create_lake_view(viewPath, 'join_of_views', leftViewPath, " +
            "leftCols, rightViewPath, rightCols, keys[, stateBuckets" +
            "[, leftFilter[, rightFilter]]]) — a join view whose both " +
            "sides are maintained views; refresh the sources first")
        def_.put("left", strLit(args(2), "leftViewPath"))
        putList("leftCols", cols(strLit(args(3), "leftCols")))
        def_.put("right", strLit(args(4), "rightViewPath"))
        putList("rightCols", cols(strLit(args(5), "rightCols")))
        putList("keys", cols(strLit(args(6), "keys")))
        def_.put("stateBuckets",
          args.lift(7).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
        args.lift(8).map(strLit(_, "leftFilter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("leftFilter", _))
        args.lift(9).map(strLit(_, "rightFilter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("rightFilter", _))
      case "join" =>
        require(args.length >= 9 && args.length <= 12,
          "create_lake_view(viewPath, 'join', leftPath, leftTypes, " +
            "leftCols, rightPath, rightTypes, rightCols, keys" +
            "[, stateBuckets[, leftFilter[, rightFilter]]]) — filters " +
            "are SQL predicates ('' = none)")
        def_.put("left", strLit(args(2), "leftPath"))
        def_.put("leftTypes", strLit(args(3), "leftTypes"))
        putList("leftCols", cols(strLit(args(4), "leftCols")))
        def_.put("right", strLit(args(5), "rightPath"))
        def_.put("rightTypes", strLit(args(6), "rightTypes"))
        putList("rightCols", cols(strLit(args(7), "rightCols")))
        putList("keys", cols(strLit(args(8), "keys")))
        def_.put("stateBuckets",
          args.lift(9).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
        args.lift(10).map(strLit(_, "leftFilter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("leftFilter", _))
        args.lift(11).map(strLit(_, "rightFilter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("rightFilter", _))
      case "join_aggregate" =>
        require(args.length >= 11 && args.length <= 18,
          "create_lake_view(viewPath, 'join_aggregate', leftPath, " +
            "leftTypes, leftCols, rightPath, rightTypes, rightCols, " +
            "joinKeys, aggKeys, aggSums[, minMax[, stateBuckets" +
            "[, leftFilter[, rightFilter[, distincts[, topks" +
            "[, hists]]]]]]]) — aggSums " +
            "entries may be `alias:expr`; filters are SQL predicates " +
            "('' = none); distincts maintains exact per-group " +
            "COUNT(DISTINCT col) over the joined rows as dc_<col>; a " +
            "topks entry is `col:k`, a hists entry `col:lo:hi:bins`")
        def_.put("left", strLit(args(2), "leftPath"))
        def_.put("leftTypes", strLit(args(3), "leftTypes"))
        putList("leftCols", cols(strLit(args(4), "leftCols")))
        def_.put("right", strLit(args(5), "rightPath"))
        def_.put("rightTypes", strLit(args(6), "rightTypes"))
        putList("rightCols", cols(strLit(args(7), "rightCols")))
        putList("keys", cols(strLit(args(8), "joinKeys")))
        putList("aggKeys", cols(strLit(args(9), "aggKeys")))
        putList("aggSums", sumSpecs(strLit(args(10), "aggSums")))
        putList("minMax",
          args.lift(11).map(a => cols(strLit(a, "minMax"))).getOrElse(Nil))
        def_.put("stateBuckets",
          args.lift(12).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
        args.lift(13).map(strLit(_, "leftFilter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("leftFilter", _))
        args.lift(14).map(strLit(_, "rightFilter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("rightFilter", _))
        putList("distincts",
          args.lift(15).map(a => cols(strLit(a, "distincts"))).getOrElse(Nil))
        putList("topks",
          args.lift(16).map(a => cols(strLit(a, "topks"))).getOrElse(Nil))
        putList("hists",
          args.lift(17).map(a => cols(strLit(a, "hists"))).getOrElse(Nil))
      case "distinct_count" =>
        require(args.length >= 6 && args.length <= 8,
          "create_lake_view(viewPath, 'distinct_count', tablePath, " +
            "fieldTypes, keys, valueCol[, filter[, stateBuckets]]) — " +
            "exact per-group COUNT(DISTINCT valueCol) maintained FULLY " +
            "incrementally (no rescan under inserts or deletes) as a " +
            "chain of two additive views; read it back as column `n`")
        def_.put("table", strLit(args(2), "tablePath"))
        def_.put("fieldTypes", strLit(args(3), "fieldTypes"))
        putList("keys", cols(strLit(args(4), "keys")))
        def_.put("valueCol", strLit(args(5), "valueCol"))
        args.lift(6).map(strLit(_, "filter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("filter", _))
        def_.put("stateBuckets",
          args.lift(7).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
      case "distinct_count_over_view" =>
        require(args.length >= 5 && args.length <= 7,
          "create_lake_view(viewPath, 'distinct_count_over_view', " +
            "sourceViewPath, keys, valueCol[, filter[, stateBuckets]]) — " +
            "COUNT(DISTINCT valueCol) over ANOTHER maintained view's " +
            "rows (join kinds contribute stored multiplicities), " +
            "maintained fully incrementally; refresh the source first")
        def_.put("source", strLit(args(2), "sourceViewPath"))
        putList("keys", cols(strLit(args(3), "keys")))
        def_.put("valueCol", strLit(args(4), "valueCol"))
        args.lift(5).map(strLit(_, "filter")).map(_.trim)
          .filter(_.nonEmpty).foreach(def_.put("filter", _))
        def_.put("stateBuckets",
          args.lift(6).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
      case "join3" =>
        require(args.length >= 13 && args.length <= 17,
          "create_lake_view(viewPath, 'join3', p0, types0, cols0, " +
            "p1, types1, cols1, p2, types2, cols2, keys01, keys12" +
            "[, stateBuckets[, filter0[, filter1[, filter2]]]]) — " +
            "filters are SQL predicates ('' = none)")
        def_.put("p0", strLit(args(2), "p0"))
        def_.put("types0", strLit(args(3), "types0"))
        putList("cols0", cols(strLit(args(4), "cols0")))
        def_.put("p1", strLit(args(5), "p1"))
        def_.put("types1", strLit(args(6), "types1"))
        putList("cols1", cols(strLit(args(7), "cols1")))
        def_.put("p2", strLit(args(8), "p2"))
        def_.put("types2", strLit(args(9), "types2"))
        putList("cols2", cols(strLit(args(10), "cols2")))
        putList("keys01", cols(strLit(args(11), "keys01")))
        putList("keys12", cols(strLit(args(12), "keys12")))
        def_.put("stateBuckets",
          args.lift(13).map(intLit(_, "stateBuckets"))
            .getOrElse(graft.operators.LakeView.AutoBuckets))
        Seq(("filter0", 14), ("filter1", 15), ("filter2", 16)).foreach {
          case (f, i) => args.lift(i).map(strLit(_, f)).map(_.trim)
            .filter(_.nonEmpty).foreach(def_.put(f, _))
        }
      case other => throw new IllegalArgumentException(
        "create_lake_view: kind must be 'aggregate', 'join', " +
          "'join_aggregate', 'join3', 'aggregate_over_view', " +
          s"'join_of_views', 'distinct_count', or " +
          s"'distinct_count_over_view', got '$other'")
    }
    val json = mapper.writeValueAsString(def_)
    LakeCommand.oneRow("create_lake_view", createSchema) { spark2 =>
      val dir = new Path(viewPath)
      val fs = dir.getFileSystem(spark2.sparkContext.hadoopConfiguration)
      val defPath = new Path(dir, DefName)
      val created =
        if (fs.exists(defPath)) {
          val existing = mapper.readTree(readFully(fs, defPath))
          require(existing == mapper.readTree(json),
            s"create_lake_view: $viewPath already holds a DIFFERENT " +
              s"definition ($existing) — a view's fold rules are fixed at " +
              "creation; use a new path")
          false
        } else {
          fs.mkdirs(dir)
          // temp-write + rename: a reader never sees a torn definition.
          // The temp name is UNIQUE per attempt — a fixed name would let
          // two racing creators overwrite each other's staged payload and
          // rename the OTHER's definition into place as their own.
          val tmp = new Path(dir,
            s".$DefName.${java.util.UUID.randomUUID()}.tmp")
          val out = fs.create(tmp, true)
          try out.write(json.getBytes("UTF-8")) finally out.close()
          if (!fs.rename(tmp, defPath)) {
            // lost a create race: verify the winner wrote the same thing
            require(fs.exists(defPath) &&
              mapper.readTree(readFully(fs, defPath)) == mapper.readTree(json),
              s"create_lake_view: concurrent conflicting create at $viewPath")
            fs.delete(tmp, false)
            false
          } else true
        }
      Row(kind, created)
    }
  }

  // ---- drop_lake_view ---------------------------------------------------

  private val dropSchema = StructType(Seq(
    StructField("dropped", BooleanType, nullable = false)))

  /** Remove a view: definition, generation pointers, and state. Returns
    * dropped=false when nothing was defined there (idempotent drops);
    * refuses a path that exists but holds no definition — deleting a
    * directory this surface did not create is not a view drop. */
  def dropPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "drop_lake_view(viewPath)")
    val viewPath = strLit(args.head, "viewPath")
    LakeCommand.oneRow("drop_lake_view", dropSchema) { spark =>
      val dir = new Path(viewPath)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dropped =
        if (!fs.exists(dir)) false
        else {
          require(fs.exists(new Path(dir, DefName)),
            s"drop_lake_view: $viewPath exists but holds no view " +
              "definition — refusing to delete a directory this surface " +
              "did not create")
          fs.delete(dir, true)
        }
      Row(dropped)
    }
  }

  // ---- refresh_lake_view ------------------------------------------------

  private val refreshSchema = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("from_left", LongType, nullable = false),
    StructField("to_left", LongType, nullable = false),
    StructField("from_right", LongType, nullable = true),
    StructField("to_right", LongType, nullable = true),
    StructField("changed", LongType, nullable = false),
    // third-table window, 'join3' only (appended nullable columns so
    // the two-table kinds' row positions never move)
    StructField("from_third", LongType, nullable = true),
    StructField("to_third", LongType, nullable = true)))

  def refreshPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "refresh_lake_view(viewPath)")
    val viewPath = strLit(args.head, "viewPath")
    // the definition loads at ANALYSIS (a missing view is an analysis
    // error, like a missing table); the refresh itself is command WORK
    // and runs at execution — EXPLAIN advances no watermark
    val d = loadDef(SparkSession.active, viewPath)
    import scala.jdk.CollectionConverters._
    def list(f: String): Seq[String] =
      Option(d.get(f)).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Nil)
    def buckets: Int = Option(d.get("stateBuckets")).map(_.asInt())
      .getOrElse(graft.operators.LakeView.AutoBuckets)
    def hists: Seq[graft.operators.LakeView.HistSpec] =
      list("hists").map { e =>
        val parts = e.split(":")
        require(parts.length == 4,
          s"refresh_lake_view: a hists entry must be `col:lo:hi:bins`, " +
            s"got '$e'")
        try graft.operators.LakeView.HistSpec(parts(0).trim,
          parts(1).trim.toDouble, parts(2).trim.toDouble,
          parts(3).trim.toInt)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"refresh_lake_view: hists entry '$e' has non-numeric " +
              "lo/hi/bins")
        }
      }
    def topKs: Seq[(String, Int)] = list("topks").map { e =>
      val i = e.lastIndexOf(':')
      require(i > 0 && i < e.length - 1,
        s"refresh_lake_view: a topks entry must be `col:k`, got '$e'")
      val k = e.substring(i + 1).trim
      require(k.forall(_.isDigit),
        s"refresh_lake_view: topks k must be a positive integer, got '$e'")
      (e.substring(0, i).trim, k.toInt)
    }
    def row(spark: SparkSession): Row = d.get("kind").asText() match {
      case "aggregate" =>
        val r = graft.operators.LakeView.refreshAggregate(spark,
          d.get("table").asText(), d.get("fieldTypes").asText(), viewPath,
          list("keys"), list("sums"), list("minMax"),
          rowFilter = Option(d.get("filter")).map(_.asText()),
          stateBuckets = buckets,
          distinctCols = list("distincts"), topKs = topKs, hists = hists)
        Row("aggregate", r.fromVersion, r.toVersion, null, null,
          r.groupsChanged, null, null)
      case "aggregate_over_view" =>
        val r = graft.operators.LakeView.refreshAggregateOverView(spark,
          d.get("source").asText(), viewPath,
          list("keys"), list("sums"), list("minMax"),
          rowFilter = Option(d.get("filter")).map(_.asText()),
          stateBuckets = buckets,
          distinctCols = list("distincts"), topKs = topKs, hists = hists)
        Row("aggregate_over_view", r.fromVersion, r.toVersion, null, null,
          r.groupsChanged, null, null)
      case "join_of_views" =>
        val r = graft.operators.LakeView.refreshJoinOfViews(spark,
          viewPath,
          d.get("left").asText(), list("leftCols"),
          d.get("right").asText(), list("rightCols"), list("keys"),
          stateBuckets = buckets,
          leftFilter = Option(d.get("leftFilter")).map(_.asText()),
          rightFilter = Option(d.get("rightFilter")).map(_.asText()))
        Row("join_of_views", r.fromLeft, r.toLeft, r.fromRight,
          r.toRight, r.deltaRows, null, null)
      case "join" =>
        val r = graft.operators.LakeView.refreshJoin(spark, viewPath,
          d.get("left").asText(), d.get("leftTypes").asText(),
          list("leftCols"),
          d.get("right").asText(), d.get("rightTypes").asText(),
          list("rightCols"), list("keys"),
          stateBuckets = buckets,
          leftFilter = Option(d.get("leftFilter")).map(_.asText()),
          rightFilter = Option(d.get("rightFilter")).map(_.asText()))
        Row("join", r.fromLeft, r.toLeft, r.fromRight, r.toRight,
          r.deltaRows, null, null)
      case "join_aggregate" =>
        val r = graft.operators.LakeView.refreshJoinAggregate(spark,
          viewPath,
          d.get("left").asText(), d.get("leftTypes").asText(),
          list("leftCols"),
          d.get("right").asText(), d.get("rightTypes").asText(),
          list("rightCols"), list("keys"),
          list("aggKeys"), list("aggSums"), list("minMax"),
          stateBuckets = buckets,
          leftFilter = Option(d.get("leftFilter")).map(_.asText()),
          rightFilter = Option(d.get("rightFilter")).map(_.asText()),
          distinctCols = list("distincts"), topKs = topKs, hists = hists)
        Row("join_aggregate", r.fromLeft, r.toLeft, r.fromRight,
          r.toRight, r.deltaRows, null, null)
      case "distinct_count" =>
        val r = graft.operators.LakeView.refreshDistinctCount(spark,
          d.get("table").asText(), d.get("fieldTypes").asText(), viewPath,
          list("keys"), d.get("valueCol").asText(),
          rowFilter = Option(d.get("filter")).map(_.asText()),
          stateBuckets = buckets)
        Row("distinct_count", r.fromVersion, r.toVersion, null, null,
          r.groupsChanged, null, null)
      case "distinct_count_over_view" =>
        val r = graft.operators.LakeView.refreshDistinctCountOverView(
          spark, d.get("source").asText(), viewPath,
          list("keys"), d.get("valueCol").asText(),
          rowFilter = Option(d.get("filter")).map(_.asText()),
          stateBuckets = buckets)
        Row("distinct_count_over_view", r.fromVersion, r.toVersion, null,
          null, r.groupsChanged, null, null)
      case "join3" =>
        val r = graft.operators.LakeView.refreshJoin3(spark, viewPath,
          d.get("p0").asText(), d.get("types0").asText(), list("cols0"),
          d.get("p1").asText(), d.get("types1").asText(), list("cols1"),
          d.get("p2").asText(), d.get("types2").asText(), list("cols2"),
          list("keys01"), list("keys12"),
          stateBuckets = buckets,
          filter0 = Option(d.get("filter0")).map(_.asText()),
          filter1 = Option(d.get("filter1")).map(_.asText()),
          filter2 = Option(d.get("filter2")).map(_.asText()))
        Row("join3", r.fromHeads._1, r.toHeads._1, r.fromHeads._2,
          r.toHeads._2, r.deltaRows, r.fromHeads._3, r.toHeads._3)
      case other => throw new IllegalArgumentException(
        s"refresh_lake_view: definition at $viewPath has kind '$other' — " +
          "expected 'aggregate', 'join', 'join_aggregate', 'join3', " +
          "'aggregate_over_view', 'join_of_views', 'distinct_count', or " +
          "'distinct_count_over_view' (damaged _view.json?)")
    }
    LakeCommand.oneRow("refresh_lake_view", refreshSchema)(row)
  }

  // ---- view_changes (feed read) -----------------------------------------

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"view_changes: $what must be an integer literal, got $other")
  }

  /** `view_changes(viewPath, fromGen[, toGen])` — a maintained view's
    * generation feed in FROM position, mirroring [[TableChanges]]: the
    * signed content delta between two LIVE generations (columns = the
    * view's own plus `m`; aggregate-shaped state emits ±1, Z-relation
    * state ± its stored multiplicity), derived by diffing generation
    * pointers ([[graft.operators.LakeView.changesBetween]] — reads only
    * rewritten buckets, cost ∝ touched state). `fromGen = 0` is the
    * bootstrap window; `toGen` defaults to the newest generation.
    * Read-only, so it resolves to a plain relation — EXPLAIN is
    * trivially inert — and liveness refuses loudly at resolve; a
    * consumer racing a same-JVM maintainer scopes the whole read in
    * [[graft.operators.LakeView.withPinnedGenerations]]. */
  def changesPlan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.length == 2 || args.length == 3,
      "view_changes(viewPath, fromGen[, toGen])")
    val viewPath = strLit(args.head, "viewPath")
    loadDef(spark, viewPath) // a defined view, not a bare state dir
    val from = longLit(args(1), "fromGen")
    val to = args.lift(2).map(longLit(_, "toGen")).getOrElse(
      graft.operators.LakeView.currentGeneration(spark, viewPath))
    graft.operators.LakeView.changesBetween(spark, viewPath, from, to)
      .queryExecution.logical
  }

  // ---- lake_view (read) -------------------------------------------------

  def readPlan(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(args.length == 1 || args.length == 2,
      "lake_view(viewPath[, generationAsOf])")
    val viewPath = strLit(args.head, "viewPath")
    loadDef(spark, viewPath) // a defined view, not a bare state dir
    val gen = args.lift(1).map(intLit(_, "generationAsOf").toLong)
    graft.operators.LakeView.read(spark, viewPath, gen)
      .queryExecution.logical
  }

  private def loadDef(spark: SparkSession,
      viewPath: String): com.fasterxml.jackson.databind.JsonNode = {
    val dir = new Path(viewPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val defPath = new Path(dir, DefName)
    require(fs.exists(defPath),
      s"no lake view defined at $viewPath — create_lake_view first")
    new ObjectMapper().readTree(readFully(fs, defPath))
  }

  private def readFully(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }
}
