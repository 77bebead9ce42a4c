package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe replace of a plain-filesystem directory (the primitive under
  * the streaming upsert sink and small-files compaction, where no
  * transactional table format is available).
  *
  * The naive protocol — write staging, DELETE target, rename staging in —
  * has a fatal window: a crash between the delete and the rename leaves NO
  * target, and a subsequent run that merges "target if it exists" against
  * an absent target then overwrites staging and destroys the only complete
  * copy. This helper closes that window:
  *
  *   1. [[recover]] repairs any layout left by an interrupted prior swap
  *      (must run BEFORE the caller reads the target).
  *   2. The caller writes the replacement fully into `<target>__staging`
  *      (completeness witnessed by Spark's `_SUCCESS` marker).
  *   3. The old target is renamed ASIDE to `<target>__old` — never deleted
  *      while it is the only complete copy.
  *   4. Staging is renamed in; only then is the old copy deleted.
  *
  * At every crash point at least one complete copy exists on disk, and the
  * next [[recover]] restores the canonical layout from the markers alone.
  */
object StagedSwap {

  private def paths(target: String): (Path, Path, Path) =
    (new Path(target), new Path(target + "__staging"), new Path(target + "__old"))

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Repair the layout after a swap interrupted at any point. Callers MUST
    * invoke this before reading the target (the sink does it per batch):
    * a target absent only because the swap crashed mid-rename would
    * otherwise read as an empty table.
    */
  def recover(spark: SparkSession, target: String): Unit = {
    val (tgt, stage, old) = paths(target)
    val fs = fsOf(spark, tgt)
    if (!fs.exists(tgt)) {
      if (fs.exists(new Path(stage, "_SUCCESS"))) {
        // crashed between set-aside and swap-in: staging is complete and
        // strictly newer than the set-aside copy — finish the swap
        require(fs.rename(stage, tgt), s"swap recovery: could not rename $stage to $tgt")
      } else if (fs.exists(old)) {
        // crashed with staging incomplete after the target was set aside
        // (or a rename-in failed): the set-aside copy is the data
        require(fs.rename(old, tgt), s"swap recovery: could not rename $old to $tgt")
      }
      // neither exists -> genuinely no target yet (first write)
    }
    // anything still left over is superseded (a complete target exists)
    if (fs.exists(stage)) fs.delete(stage, true)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Replace `target` with the directory produced by `write(stagingDir)`.
    * `write` must fully materialize the replacement at the given path
    * (e.g. `df.write.mode("overwrite").parquet(stagingDir)`).
    */
  def replace(spark: SparkSession, target: String)(write: String => Unit): Unit = {
    val (tgt, stage, old) = paths(target)
    val fs = fsOf(spark, tgt)
    require(!fs.exists(stage) && !fs.exists(old),
      s"staging swap: leftover $stage or $old — run StagedSwap.recover($target) first")
    write(stage.toString)
    if (fs.exists(tgt))
      require(fs.rename(tgt, old), s"staging swap: could not set aside $tgt to $old")
    // rename signals failure by RETURN VALUE, not exception (Hadoop FS
    // contract) — unchecked, a failure here would pass silently
    require(fs.rename(stage, tgt),
      s"staging swap failed: could not rename $stage to $tgt (old copy preserved at $old)")
    fs.delete(old, true)
  }
}
