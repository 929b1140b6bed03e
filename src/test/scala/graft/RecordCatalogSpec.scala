package graft

import java.nio.file.Files

/** The SQL surface over record lakes: CREATE/INSERT/SELECT/DELETE/
  * VERSION AS OF/DROP through the RecordCatalog, by name. */
class RecordCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val nonce = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Fresh catalog per test: catalog instances cache their warehouse at
    * initialize, so reuse across tests would pin the first tmp dir. */
  private def freshCatalog(): String = {
    val cat = s"graftcat${nonce.incrementAndGet()}"
    val wh = Files.createTempDirectory("graft_cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.RecordCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  test("CREATE / INSERT / SELECT / DROP round-trip by name") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.people (Name STRING, Score DOUBLE)")
    spark.sql(
      s"""INSERT INTO $cat.ns.people
         |SELECT concat('r', CAST(id AS STRING)) AS _record_id,
         |  CAST(NULL AS TIMESTAMP) AS _created_time,
         |  concat('name', CAST(id AS STRING)) AS Name,
         |  CAST(id AS DOUBLE) AS Score
         |FROM range(10)""".stripMargin)
    val rows = spark.sql(
      s"SELECT Name, Score FROM $cat.ns.people ORDER BY Score")
      .as[(String, Double)].collect()
    assert(rows.length == 10 && rows.head == (("name0", 0.0)))
    // predicate pushdown works through the catalog path too
    val plan = spark.sql(
      s"SELECT Name FROM $cat.ns.people WHERE Score > 5")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") &&
      plan.contains("GreaterThan(Score,5.0)"), plan)
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").count() == 1)
    spark.sql(s"DROP TABLE $cat.ns.people")
    assert(spark.sql(s"SHOW TABLES IN $cat.ns").count() == 0)
  }

  test("SQL DELETE routes through deletion vectors (no file rewrites)") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.t (Score DOUBLE)")
    spark.sql(
      s"""INSERT INTO $cat.ns.t
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE) FROM range(20)""".stripMargin)
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val dir = new org.apache.hadoop.fs.Path(s"$wh/ns/t")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataBefore = fs.listStatus(dir).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    // this pushable condition must stay METADATA-ONLY even though the
    // table also offers row-level (copy-on-write) ops; the strict V2->V1
    // conversion in canDeleteWhere is what keeps a non-pushable DELETE
    // from being half-applied (Spark's default lossy conversion turned
    // `(a%2=0) OR (b>15)` into `b>15`) — those fall back to the
    // copy-on-write path instead (RowLevelOpsSpec)
    spark.sql(s"DELETE FROM $cat.ns.t WHERE Score IN " +
      "(0.0, 2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 14.0) OR Score > 15")
    val dataAfter = fs.listStatus(dir).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    assert(dataAfter == dataBefore, "DELETE must be metadata-only")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir,
      graft.sources.v2.DeletionVector.Dir)))
    assert(spark.sql(s"SELECT Score FROM $cat.ns.t ORDER BY Score")
      .as[Double].collect().toSeq == Seq(1.0, 3.0, 5.0, 7.0, 9.0, 11.0, 13.0, 15.0))
    // an unconditional DELETE empties the table (still metadata-only)
    spark.sql(s"DELETE FROM $cat.ns.t")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t").as[Long].head() == 0L)
  }

  test("TBLPROPERTIES clusterBy: storage-partitioned joins in pure SQL") {
    val cat = freshCatalog()
    Seq("facts", "dims").foreach(t => spark.sql(
      s"""CREATE TABLE $cat.ns.$t (Key STRING, V DOUBLE)
         |TBLPROPERTIES ('clusterBy'='Key',
         |               'bloomFilterColumns'='_record_id')""".stripMargin))
    spark.sql(
      s"""INSERT INTO $cat.ns.facts
         |SELECT concat('f', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  concat('k', CAST(id % 4 AS STRING)), CAST(id AS DOUBLE)
         |FROM range(40)""".stripMargin)
    spark.sql(
      s"""INSERT INTO $cat.ns.dims
         |SELECT concat('d', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  concat('k', CAST(id AS STRING)), CAST(id AS DOUBLE) * 100
         |FROM range(4)""".stripMargin)
    // every committed file is key-pure + bloomed, with NO write options
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$wh/ns/facts"))
      .filter(_.isFile).map(_.getPath.toString)
      .filterNot(p => p.contains("/_") || p.contains("/."))
      .foreach { f =>
        val st = graft.sources.v2.ZoneMap.load(fs, f).get.stats("Key")
        assert(st.min == st.max && st.nulls == 0L, s"$f: $st")
        assert(graft.sources.v2.BloomSidecar.load(fs, f).isDefined)
      }
    // the SQL join plans with zero exchanges (storage-partitioned)
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "true"); spark.conf.set(keys(1), "true")
    spark.conf.set(keys(2), "-1")
    try {
      val j = spark.sql(
        s"""SELECT f.Key, count(*) AS n, sum(f.V * d.V) AS dot
           |FROM $cat.ns.facts f JOIN $cat.ns.dims d ON f.Key = d.Key
           |GROUP BY f.Key""".stripMargin)
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        j.queryExecution.executedPlan.toString)
      assert(j.orderBy("Key").as[(String, Long, Double)].collect().length == 4)
      // a projection WITHOUT the key degrades to an unclustered scan
      assert(spark.sql(s"SELECT sum(V) FROM $cat.ns.facts")
        .as[Double].head() == (0 until 40).sum.toDouble)
      // a rewrite preserves the declared layout: files stay key-pure
      spark.sql(s"UPDATE $cat.ns.facts SET V = V + 1000 WHERE V >= 38")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$wh/ns/facts"))
        .filter(_.isFile).map(_.getPath.toString)
        .filterNot(p => p.contains("/_") || p.contains("/."))
        .foreach { f =>
          val st = graft.sources.v2.ZoneMap.load(fs, f).get.stats("Key")
          assert(st.min == st.max && st.nulls == 0L, s"post-UPDATE $f: $st")
        }
      assert(!spark.sql(
        s"""SELECT f.Key, count(*) AS n FROM $cat.ns.facts f
           |JOIN $cat.ns.dims d ON f.Key = d.Key GROUP BY f.Key""".stripMargin)
        .queryExecution.executedPlan.toString.contains("Exchange"),
        "the rewritten table must still storage-partition-join")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ALTER TABLE ADD COLUMNS is metadata-only; retype refuses") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.a (Score DOUBLE)")
    spark.sql(s"INSERT INTO $cat.ns.a SELECT 'r1', CAST(NULL AS TIMESTAMP), 1.5")
    spark.sql(s"ALTER TABLE $cat.ns.a ADD COLUMNS (Tag STRING)")
    // the pre-alter row reads the new column as NULL — no rewrite happened
    assert(spark.sql(s"SELECT Score, Tag FROM $cat.ns.a")
      .as[(Double, Option[String])].collect().toSeq == Seq((1.5, None)))
    spark.sql(s"INSERT INTO $cat.ns.a SELECT 'r2', CAST(NULL AS TIMESTAMP), 2.5, 'x'")
    assert(spark.sql(s"SELECT Score, Tag FROM $cat.ns.a ORDER BY Score")
      .as[(Double, Option[String])].collect().toSeq ==
      Seq((1.5, None), (2.5, Some("x"))))
    // retype would strand committed data: refused loudly
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.a ALTER COLUMN Score TYPE STRING")
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs(ex).exists(m => m.contains("unsupported ALTER") ||
      m.contains("retype")), msgs(ex))
  }

  test("VERSION AS OF reads the pinned snapshot by name") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.v (Score DOUBLE)")
    def ins(from: Int, until: Int): Unit = spark.sql(
      s"""INSERT INTO $cat.ns.v
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE) FROM range($from, $until)""".stripMargin)
    ins(0, 5)
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    graft.operators.LakeSnapshots.commit(spark, s"$wh/ns/v")
    ins(5, 9)
    spark.sql(s"DELETE FROM $cat.ns.v WHERE Score = 2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.v").as[Long].head() == 8L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.v VERSION AS OF 1").as[Long].head() == 5L)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.ns.v VERSION AS OF 1 WHERE Score = 2")
      .as[Long].head() == 1L) // the delete reverses under v1
  }

  test("RENAME COLUMN is metadata-only: old rows read under the new " +
      "name, new rows too, time travel included") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.r (Score DOUBLE, Tag STRING)")
    def ins(from: Int, until: Int): Unit = spark.sql(
      s"""INSERT INTO $cat.ns.r
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE), concat('t', CAST(id % 3 AS STRING))
         |FROM range($from, $until)""".stripMargin)
    ins(0, 10)
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    graft.operators.LakeSnapshots.commit(spark, s"$wh/ns/r") // pre-rename v1
    spark.sql(s"ALTER TABLE $cat.ns.r RENAME COLUMN Score TO Points")
    ins(10, 15) // post-rename rows write under the NEW wire key
    assert(spark.table(s"$cat.ns.r").columns.toSeq
      .containsSlice(Seq("Points", "Tag")))
    // old (wire key Score) and new (wire key Points) rows merge
    assert(spark.sql(s"SELECT sum(Points) FROM $cat.ns.r")
      .as[Double].head() == (0 until 15).sum.toDouble)
    // predicates on the renamed column hit BOTH generations of rows
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.r WHERE Points >= 8")
      .as[Long].head() == 7L)
    // time travel to the PRE-rename snapshot reads under the new name
    assert(spark.sql(
      s"SELECT sum(Points) FROM $cat.ns.r VERSION AS OF 1")
      .as[Double].head() == (0 until 10).sum.toDouble)
    // chained rename keeps the whole former-key lineage readable
    spark.sql(s"ALTER TABLE $cat.ns.r RENAME COLUMN Points TO Pts")
    assert(spark.sql(s"SELECT sum(Pts) FROM $cat.ns.r")
      .as[Double].head() == (0 until 15).sum.toDouble)
    // reusing a former name is the resurrection hazard: refused
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.r ADD COLUMNS (Score DOUBLE)")
    }
    assert(e.getMessage.contains("former or dropped"), e.getMessage)
  }

  test("UPDATE after RENAME: the copy-on-write scan reads old rows " +
      "through former keys (no silent NULL-out)") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.u (Score DOUBLE, Tag STRING)")
    spark.sql(
      s"""INSERT INTO $cat.ns.u
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE), concat('t', CAST(id AS STRING))
         |FROM range(10)""".stripMargin)
    spark.sql(s"ALTER TABLE $cat.ns.u RENAME COLUMN Score TO Pts")
    spark.sql(s"UPDATE $cat.ns.u SET Pts = Pts + 100 WHERE Pts < 3")
    val got = spark.sql(s"SELECT sum(Pts), count(Pts), count(Tag) FROM $cat.ns.u")
      .as[(Double, Long, Long)].head()
    // 0,1,2 -> 100,101,102; others unchanged; nothing nulled
    assert(got == (((0 until 10).sum + 300).toDouble, 10L, 10L), got.toString)
  }

  test("DROP COLUMN masks the field and tombstones its wire keys") {
    val cat = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ns.d (Score DOUBLE, Tag STRING)")
    spark.sql(
      s"""INSERT INTO $cat.ns.d
         |SELECT concat('r', CAST(id AS STRING)), CAST(NULL AS TIMESTAMP),
         |  CAST(id AS DOUBLE), concat('t', CAST(id AS STRING))
         |FROM range(5)""".stripMargin)
    spark.sql(s"ALTER TABLE $cat.ns.d DROP COLUMN Tag")
    assert(!spark.table(s"$cat.ns.d").columns.contains("Tag"))
    assert(spark.sql(s"SELECT sum(Score) FROM $cat.ns.d")
      .as[Double].head() == 10.0)
    // re-adding the dropped name would resurrect orphaned values: refused
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.ns.d ADD COLUMNS (Tag STRING)")
    }
    assert(e.getMessage.contains("former or dropped"), e.getMessage)
    // a FRESH name is fine and reads NULL everywhere
    spark.sql(s"ALTER TABLE $cat.ns.d ADD COLUMNS (Label STRING)")
    assert(spark.sql(s"SELECT count(Label) FROM $cat.ns.d")
      .as[Long].head() == 0L)
  }
}
