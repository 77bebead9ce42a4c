package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shards, in-engine (same posture as Xlsx/Rds/Avro:
  * the FORMAT logic lives here, the distribution comes from Spark).
  *
  * Training loaders (WebDataset, torchdata) stream corpora as directories
  * of tar files — one sequential read per shard, entries grouped by
  * sample. This sink writes POSIX ustar archives DISTRIBUTED: the frame
  * is repartitioned by shard id, each task streams its shards' entries
  * through the Hadoop filesystem (works on any object store), and entry
  * order within a shard is pinned by name — so the bytes of every shard
  * are a pure function of its contents (mtime 0, fixed mode/uid).
  * Commit protocol: every shard is written to a task-attempt-unique
  * `.tmp` path and RENAMED into place only after its end-of-archive
  * marker — a failing/zombie/speculative attempt can never delete or
  * clobber a shard a successful attempt committed (it only ever touches
  * its own temp file), and a duplicate commit of the same shard is
  * byte-identical by construction. Stale `shard-*.tar` from a previous
  * run are cleared before writing (parquet-overwrite semantics — the
  * reader globs `*.tar`, so leftovers would silently mix old corpus
  * entries into a new run).
  *
  * The reader streams ENTRIES, not shards: each task opens its shard
  * file and yields one row per entry as it walks the archive, so peak
  * memory is one entry's payload — not the shard — and shards larger
  * than 2 GiB (Spark's `binaryFile` cap, which the round-7 reader
  * inherited) read fine.
  *
  * Surface: regular-file entries, names <= 100 bytes (the ustar name
  * field; WebDataset sample names are short by convention), payload any
  * size up to the 8 GiB octal size field. Long-name extensions
  * (GNU @LongLink / PAX) are out of scope — reject at write, skip at
  * read; GNU base-256 numeric fields are rejected with an explicit
  * message.
  */
object Tar {

  private val Block = 512

  /** One ustar header block for a regular file: POSIX magic
    * ("ustar" NUL, version "00"), octal numeric fields NUL-terminated,
    * checksum as six octal digits + NUL + space.
    */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100, s"tar entry name exceeds 100 bytes: '$name'")
    // bound = 8^11 - 1: what 11 octal digits + NUL can actually hold — a
    // larger require bound would let the formatted size silently overrun
    // the field's NUL into mtime, corrupting the header with no error
    require(size >= 0 && size <= 0x1FFFFFFFFL, s"tar entry size exceeds the ustar field: $size")
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8"); System.arraycopy(b, 0, h, off, b.length)
    }
    // octal numeric field: (len-1) digits then a NUL terminator
    def putOct(off: Int, len: Int, v: Long): Unit =
      put(off, ("%0" + (len - 1) + "o").format(v))
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    putOct(100, 8, 420)                          // mode 0644
    putOct(108, 8, 0)                            // uid
    putOct(116, 8, 0)                            // gid
    putOct(124, 12, size)
    putOct(136, 12, 0)                           // mtime 0: deterministic bytes
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0'                                 // typeflag: regular file
    put(257, "ustar")                            // magic, h(262) stays NUL
    put(263, "00")                               // version
    var sum = 0L
    var i = 0
    while (i < Block) { sum += h(i) & 0xff; i += 1 }
    put(148, "%06o".format(sum))                 // 6 digits; h(154) stays NUL
    h(155) = ' '.toByte
    h
  }

  private def padTo(n: Long): Int = ((Block - (n % Block)) % Block).toInt

  /** Distributed shard sink: `df` must carry (`shardCol` integral,
    * `nameCol` string, `payloadCol` binary). Every shard becomes
    * `path/shard-NNNNN.tar` with entries in name order. One shuffle on
    * the shard id; each shard is written by exactly one task as one
    * sequential stream — the write pattern object stores want — and
    * committed by atomic rename from a task-attempt-unique temp path
    * (see the object doc for the failure contract).
    */
  def writeShards(
      df: DataFrame,
      path: String,
      shardCol: String = "shard",
      nameCol: String = "name",
      payloadCol: String = "payload"): Unit = {
    // overwrite semantics: clear committed shards AND orphaned temps from
    // any previous (possibly crashed) run before writing — a re-run that
    // produces fewer/different shard ids must not leave stale files for
    // the reader's glob to silently include
    val base = new Path(path)
    val driverFs = base.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (driverFs.exists(base)) {
      (driverFs.globStatus(new Path(base, "shard-*.tar")) ++
        driverFs.globStatus(new Path(base, ".shard-*.tmp")))
        .foreach(st => driverFs.delete(st.getPath, false))
    } else driverFs.mkdirs(base)
    df.select(col(shardCol).cast("long").as("s"), col(nameCol).as("n"),
        col(payloadCol).as("p"))
      .repartition(col("s"))
      .sortWithinPartitions(col("s"), col("n"))
      .foreachPartition { (it: Iterator[Row]) =>
        // executors resolve the filesystem from the classpath-default
        // Hadoop config (core-site etc.) — the standard executor-side
        // posture; no driver conf needs shipping for file:// or s3a://
        val fs = new Path(path).getFileSystem(
          new org.apache.hadoop.conf.Configuration())
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId())
          .getOrElse(java.util.UUID.randomUUID().getLeastSignificantBits.abs)
        var cur: Long = Long.MinValue
        var curTmp: Path = null
        var curFinal: Path = null
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def finish(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // end-of-archive marker
          out.close(); out = null
          if (!fs.rename(curTmp, curFinal)) {
            // rename refused: if another attempt already committed the
            // shard, its bytes are identical (deterministic archive) —
            // drop our duplicate; anything else is a real commit failure
            if (fs.exists(curFinal)) fs.delete(curTmp, false)
            else throw new java.io.IOException(s"failed to commit $curTmp -> $curFinal")
          }
        }
        try {
          it.foreach { r =>
            // fail loudly per row: a null shard/name/payload would otherwise
            // surface as a bare NPE (or a 0-shard misfile) deep in the task
            require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
              "tar sink requires non-null shard, name and payload")
            val s = r.getLong(0)
            if (s != cur) {
              finish()
              cur = s
              curFinal = new Path(path, f"shard-$s%05d.tar")
              curTmp = new Path(path, f".shard-$s%05d.attempt-$attempt.tmp")
              out = fs.create(curTmp, true)
            }
            val name = r.getString(1)
            val payload = r.getAs[Array[Byte]](2)
            out.write(header(name, payload.length.toLong))
            out.write(payload)
            out.write(new Array[Byte](padTo(payload.length.toLong)))
          }
          finish()
        } catch {
          case t: Throwable =>
            // clean up ONLY this attempt's temp file — the final path is
            // never deleted here, so a late-failing zombie attempt cannot
            // destroy a shard a successful retry already committed
            if (out != null) {
              try out.close() catch { case _: Throwable => () }
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

  /** POSIX octal numeric field: optional leading spaces/NULs (other
    * writers space-pad), octal digits, then a space/NUL terminator. GNU
    * base-256 (0x80 flag on the first byte) is rejected EXPLICITLY — the
    * round-7 parser read such fields as size 0 and then failed with a
    * misleading "not a ustar header" one entry later.
    */
  private def parseSizeField(block: Array[Byte], file: String, off: Long): Long = {
    require((block(124) & 0x80) == 0,
      s"GNU base-256 size field unsupported at offset $off in $file")
    val raw = new String(block, 124, 12, "UTF-8")
    val body = raw.dropWhile(c => c == ' ' || c == '\u0000')
    val digits = body.takeWhile(c => c >= '0' && c <= '7')
    val rest = body.drop(digits.length)
    require(rest.isEmpty || rest.head == ' ' || rest.head == '\u0000',
      s"unparseable tar size field '${raw.trim}' at offset $off in $file")
    if (digits.isEmpty) 0L else java.lang.Long.parseLong(digits, 8)
  }

  /** Distributed STREAMING scan: every `*.tar` under `path` is assigned
    * to a task, which walks the archive entry by entry over an open
    * `FileSystem` stream — one header block + one payload in memory at a
    * time, so a shard's size is bounded by disk, not executor heap (no
    * 2 GiB `binaryFile` cliff). Non-regular entries (dirs, links,
    * PAX/LongLink metadata) are SKIPPED BY SEEK — their payloads are
    * never materialized either. Truncation (EOF before the
    * end-of-archive marker, or mid-entry) fails loudly; zero bytes are
    * never fabricated.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val base = new Path(path)
    val driverFs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = driverFs.globStatus(new Path(base, "*.tar"))
      .map(_.getPath.toString).sorted.toSeq
    val ds = spark.createDataset(files)(Encoders.STRING)
      .repartition(math.max(files.size, 1))
    ds.flatMap(file => tarEntries(file))(Encoders.row(readSchema))
  }

  /** Lazy entry iterator over one shard file. The stream closes at the
    * end-of-archive marker or on task completion (listener), whichever
    * comes first — a downstream `limit` that stops consuming mid-shard
    * must not leak the handle.
    */
  private def tarEntries(file: String): Iterator[Row] = {
    val p = new Path(file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val len = fs.getFileStatus(p).getLen
    var closed = false
    def closeIn(): Unit = if (!closed) { closed = true; try in.close() catch { case _: Throwable => () } }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit](_ => closeIn()))
    new Iterator[Row] {
      private var pos = 0L
      private var pending: Row = null
      private var done = false

      private def readBlock(): Array[Byte] = {
        require(pos + Block <= len,
          s"truncated tar (cut mid-header, no end-of-archive marker) at offset $pos in $file")
        val b = new Array[Byte](Block)
        in.readFully(pos, b, 0, Block)
        pos += Block
        b
      }

      // walk forward to the next regular entry (or the end marker),
      // materializing only that entry's payload
      private def advance(): Unit = {
        while (pending == null && !done) {
          val block = readBlock()
          if (block.forall(_ == 0)) { done = true; closeIn() }
          else {
            val hdrOff = pos - Block
            val magic = new String(block, 257, 5, "UTF-8")
            require(magic == "ustar", s"not a ustar header at offset $hdrOff in $file")
            var nameEnd = 0
            while (nameEnd < 100 && block(nameEnd) != 0) nameEnd += 1
            val name = new String(block, 0, nameEnd, "UTF-8")
            val size = parseSizeField(block, file, hdrOff)
            require(pos + size <= len,
              s"truncated tar entry '$name' (size $size) at offset $hdrOff in $file")
            val typeflag = block(156)
            if (typeflag == '0'.toByte || typeflag == 0.toByte) {
              // one entry's payload is the only buffer this reader holds
              require(size <= Int.MaxValue - 2L * Block,
                s"tar entry '$name' exceeds the single-entry buffer bound (size $size) in $file")
              val payload = new Array[Byte](size.toInt)
              in.readFully(pos, payload, 0, size.toInt)
              pending = Row(file, name, payload)
            }
            pos += size + Tar.padTo(size) // non-regular entries: skipped by seek
          }
        }
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
