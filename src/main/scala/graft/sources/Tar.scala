package graft.sources

import org.apache.hadoop.fs.Path
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
  * are a pure function of its contents (mtime 0, fixed mode/uid), and a
  * retried task rewrites the identical file. The reader distributes via
  * `binaryFile`, one executor-side parse per shard.
  *
  * Surface: regular-file entries, names <= 100 bytes (the ustar name
  * field; WebDataset sample names are short by convention), payload any
  * size. Long-name extensions (GNU @LongLink / PAX) are out of scope —
  * reject at write, skip at read.
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
    * sequential stream — the write pattern object stores want.
    */
  def writeShards(
      df: DataFrame,
      path: String,
      shardCol: String = "shard",
      nameCol: String = "name",
      payloadCol: String = "payload"): Unit = {
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
        var cur: Long = Long.MinValue
        var curFile: Path = null
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def finish(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // end-of-archive marker
          out.close(); out = null
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
              curFile = new Path(path, f"shard-$s%05d.tar")
              out = fs.create(curFile, true)
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
            // a failing task must NOT leave a prefix-valid archive behind:
            // writing the end marker here would make the partial shard
            // indistinguishable from a complete one, so close raw and
            // delete the in-progress file (task retry rewrites it whole)
            if (out != null) {
              try out.close() catch { case _: Throwable => () }
              try fs.delete(curFile, false) catch { case _: Throwable => () }
            }
            throw t
        }
      }
  }

  val readSchema: StructType = StructType(Seq(
    StructField("shard_file", StringType),
    StructField("name", StringType),
    StructField("content", BinaryType)))

  /** Distributed scan: every `*.tar` under `path` parses on an executor
    * into (shard_file, name, content) rows. Non-regular entries (dirs,
    * links, PAX/LongLink metadata) are skipped by their size, like any
    * tar reader.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(path)
      .select(col("path"), col("content"))
    bin.flatMap { r =>
      val file = r.getString(0)
      val bytes = r.getAs[Array[Byte]](1)
      val outRows = Seq.newBuilder[Row]
      var off = 0
      var done = false
      // `done` flips only on the end-of-archive zero block: running out of
      // bytes WITHOUT having seen it is a truncation (e.g. a download cut
      // exactly at a 512-boundary) and must fail, not return partial rows
      while (!done && off + Block <= bytes.length) {
        val block = java.util.Arrays.copyOfRange(bytes, off, off + Block)
        if (block.forall(_ == 0)) done = true
        else {
          val magic = new String(block, 257, 5, "UTF-8")
          require(magic == "ustar", s"not a ustar header at offset $off in $file")
          var nameEnd = 0
          while (nameEnd < 100 && block(nameEnd) != 0) nameEnd += 1
          val name = new String(block, 0, nameEnd, "UTF-8")
          val sizeStr = new String(block, 124, 12, "UTF-8")
            .takeWhile(c => c >= '0' && c <= '7')
          val size = java.lang.Long.parseLong(if (sizeStr.isEmpty) "0" else sizeStr, 8)
          // a truncated archive must fail, not fabricate: copyOfRange PADS
          // WITH ZEROS past the source length, which would silently turn a
          // cut-off download into zero-filled training payloads
          require(size <= Int.MaxValue - 2L * Block &&
              off + Block + size <= bytes.length,
            s"truncated or oversized tar entry '$name' (size $size) at offset $off in $file")
          val typeflag = block(156)
          if (typeflag == '0'.toByte || typeflag == 0.toByte) {
            outRows += Row(file, name,
              java.util.Arrays.copyOfRange(bytes, off + Block,
                off + Block + size.toInt))
          }
          off += Block + size.toInt + padTo(size)
        }
      }
      require(done, s"truncated tar (no end-of-archive marker) in $file")
      outRows.result()
    }(Encoders.row(readSchema))
  }
}
