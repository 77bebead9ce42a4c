package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
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

  test("fast path: native file scan with partition pruning and filter pushdown") {
    val root = freshRoot("prune")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture().write.partitionBy("part").parquet(stage))
    val q = formatRead(root).filter(col("part") === "b" && col("id") > 5)
    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1, "expected the native vectorized parquet scan")
    // partition pruning: only partition b's files are planned
    val planned = scans.head.inputRDDs().map(_ => ()).size // force init
    val selected = scans.head.metadata.getOrElse("Location", "")
    val pruned = q.queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters") &&
      pruned.matches("(?s).*PartitionFilters: \\[.*part.*\\].*"), pruned.take(800))
    // data filter reached the parquet scan
    assert(pruned.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(id,5\\).*\\].*"),
      pruned.take(800))
    assert(q.count() == 5)
    assert(planned >= 0 && selected != null) // silence unused warnings
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
    def write(df: DataFrame, mode: String): Unit =
      df.write.format("graft").mode(mode)
        .option("partitionBy", "part").save(root)
    write(fixture(), "append") // first publish
    assert(Snapshots.latestVersion(spark, root).contains(1L))
    assert(rowsOf(formatRead(root)) == rowsOf(fixture()))
    // partition-grain replacement: only part=b restaged
    write(fixture(bump = 100).filter(col("part") === "b"), "append")
    assert(formatRead(root).filter(col("v") >= 100).count() == 10)
    assert(formatRead(root).count() == 30)
    // overwrite = FULL publish: the new version pins only this write
    write(fixture(bump = 500).filter(col("part") === "a"), "overwrite")
    assert(formatRead(root).count() == 10)
    // but the previous versions stay pinned-readable
    assert(formatRead(root, Some(2L)).count() == 30)
    // ignore no-ops on an existing table
    write(fixture(bump = 900), "ignore")
    assert(formatRead(root).count() == 10)
    // errorifexists refuses on an existing table
    intercept[IllegalStateException] {
      write(fixture(), "errorifexists")
    }
  }

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
