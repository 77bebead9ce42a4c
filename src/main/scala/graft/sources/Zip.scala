package graft.sources

import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zip shard source/sink — the [[Tar]] layout with the OTHER container
  * image/archive datasets ship in (JDK `java.util.zip`, no dependency;
  * the same zip machinery [[Xlsx]] already builds on).
  *
  * Sink contract mirrors [[Tar.writeShards]]: one shuffle on the shard
  * id, each `shard-NNNNN.zip` written by exactly one task as one
  * sequential stream, entries in name order, committed by atomic rename
  * from a task-attempt-unique temp path (a zombie attempt can only ever
  * touch its own temp file). Entries are STORED (no deflate): payload
  * bytes land verbatim — compression variance across zlib versions would
  * break retry/speculation byte-stability — with the fixed DOS-epoch
  * local timestamp, so an archive's bytes are a pure function of its
  * contents on any one JVM.
  *
  * The reader streams entries through `ZipInputStream` over the open
  * filesystem stream: one entry's payload in memory at a time, shards
  * bounded by disk rather than executor heap. Directory entries are
  * skipped; a corrupt archive fails loudly (never fabricated bytes).
  */
object Zip {

  /** Distributed shard sink: `df` must carry (`shardCol` integral,
    * `nameCol` string, `payloadCol` binary).
    */
  def writeShards(
      df: DataFrame,
      path: String,
      shardCol: String = "shard",
      nameCol: String = "name",
      payloadCol: String = "payload"): Unit = {
    val base = new Path(path)
    val driverFs = base.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (driverFs.exists(base)) {
      (driverFs.globStatus(new Path(base, "shard-*.zip")) ++
        driverFs.globStatus(new Path(base, ".shard-*.tmp")))
        .foreach(st => driverFs.delete(st.getPath, false))
    } else driverFs.mkdirs(base)
    df.select(col(shardCol).cast("long").as("s"), col(nameCol).as("n"),
        col(payloadCol).as("p"))
      .repartition(col("s"))
      .sortWithinPartitions(col("s"), col("n"))
      .foreachPartition { (it: Iterator[Row]) =>
        val fs = new Path(path).getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId())
          .getOrElse(java.util.UUID.randomUUID().getLeastSignificantBits.abs)
        var cur: Long = Long.MinValue
        var curTmp: Path = null
        var curFinal: Path = null
        var zos: ZipOutputStream = null
        def finish(): Unit = if (zos != null) {
          zos.close(); zos = null
          if (!fs.rename(curTmp, curFinal)) {
            if (fs.exists(curFinal)) fs.delete(curTmp, false)
            else throw new java.io.IOException(s"failed to commit $curTmp -> $curFinal")
          }
        }
        try {
          it.foreach { r =>
            require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
              "zip sink requires non-null shard, name and payload")
            val s = r.getLong(0)
            if (s != cur) {
              finish()
              cur = s
              curFinal = new Path(path, f"shard-$s%05d.zip")
              curTmp = new Path(path, f".shard-$s%05d.attempt-$attempt.tmp")
              zos = new ZipOutputStream(fs.create(curTmp, true))
            }
            val payload = r.getAs[Array[Byte]](2)
            val e = new ZipEntry(r.getString(1))
            // STORED entries carry size+CRC in the local header (no data
            // descriptor), so the stream stays sequential and verbatim
            e.setMethod(ZipEntry.STORED)
            e.setSize(payload.length.toLong)
            e.setCompressedSize(payload.length.toLong)
            val crc = new CRC32
            crc.update(payload, 0, payload.length)
            e.setCrc(crc.getValue)
            e.setTimeLocal(java.time.LocalDateTime.of(1980, 1, 1, 0, 0, 0))
            zos.putNextEntry(e)
            zos.write(payload)
            zos.closeEntry()
          }
          finish()
        } catch {
          case t: Throwable =>
            if (zos != null) {
              try zos.close() catch { case _: Throwable => () }
              try fs.delete(curTmp, false) catch { case _: Throwable => () }
            }
            throw t
        }
      }
  }

  val readSchema: StructType = StructType(Seq(
    StructField("shard_file", StringType),
    StructField("name", StringType),
    StructField("content", BinaryType)))

  /** Distributed streaming scan of every `*.zip` under `path`: one task
    * per shard, one entry's payload in memory at a time.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val base = new Path(path)
    val driverFs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = driverFs.globStatus(new Path(base, "*.zip"))
      .map(_.getPath.toString).sorted.toSeq
    val ds = spark.createDataset(files)(Encoders.STRING)
      .repartition(math.max(files.size, 1))
    ds.flatMap(file => zipEntries(file))(Encoders.row(readSchema))
  }

  /** One-pass entry iterator over a single archive. The stream closes
    * on whichever comes first: end-of-archive (hasNext first returns
    * false), a decode error (advance() closes before rethrowing), or
    * task completion (the TaskContext listener — the executor path's
    * abandonment guard). Driver-side callers outside a task get the
    * first two; an abandoned, partially-consumed iterator with no task
    * is the ONLY leak window, so drain or run inside a task.
    */
  private def zipEntries(file: String): Iterator[Row] = {
    val p = new Path(file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val zin = new ZipInputStream(fs.open(p))
    var closed = false
    def closeIn(): Unit = if (!closed) { closed = true; try zin.close() catch { case _: Throwable => () } }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeIn()))
    new Iterator[Row] {
      private var pending: Row = null
      private var done = false

      private def advance(): Unit = try {
        while (pending == null && !done) {
          val e = zin.getNextEntry
          if (e == null) { done = true; closeIn() }
          else if (!e.isDirectory) {
            val buf = new java.io.ByteArrayOutputStream(
              math.max(e.getSize.toInt, 64))
            val chunk = new Array[Byte](64 * 1024)
            var n = zin.read(chunk)
            while (n >= 0) {
              buf.write(chunk, 0, n)
              n = zin.read(chunk)
            }
            pending = Row(file, e.getName, buf.toByteArray)
          }
        }
      } catch {
        // close BEFORE rethrowing: a corrupt archive must not leave the
        // underlying filesystem stream open until GC on the driver path
        // (executors also get the task-completion listener)
        case t: Throwable => closeIn(); throw t
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): Row = {
        advance()
        if (pending == null) throw new NoSuchElementException("end of archive")
        val r = pending; pending = null; r
      }
    }
  }
}
