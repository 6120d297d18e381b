package graft.ops

/** Content fingerprints for parquet inputs, shared by the
  * materialized-artifact caches (the dedup cluster table in `LlmExtra`,
  * the trade-graph edge table in `Graph`, the binary-fixture dir —
  * everything under [[Artifacts]]).
  *
  * The key is SHA-256 over every part file's path, length, and PARQUET
  * FOOTER bytes (the tail metadata block: row-group offsets, per-column
  * min/max/null stats, byte sizes — any data rewrite perturbs it).
  * Content-keyed without reading content: a rewrite that lands within
  * the same mtime tick with identical sizes still changes the key (the
  * stats differ), but the driver reads only O(KB) per part file — at
  * 100 TB this walks footers, not data, the same scan the parquet
  * reader's planning phase already does. Non-parquet/tiny files (e.g.
  * `_SUCCESS`, `.crc`) hash in full — they ARE footer-sized.
  *
  * Local bare paths take the `java.io` fast path (one fewer layer per
  * footer read on the hot local[*] loop); scheme-qualified paths
  * (`hdfs://…`, `s3a://…` — the 100×-deployment inputs, same class of
  * cluster-reality fix as the Artifacts root) walk and read through
  * the Hadoop FileSystem for their scheme, producing the same
  * name-ordered digest stream. */
private[graft] object Snapshot {
  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
        .flatMap(walk)
    else Seq(f)

  /** Footer start offset given the file's last 8 bytes (4-byte LE
    * footer length + "PAR1"). A malformed length (not parquet, or
    * corrupt) falls back to 0 — hash the whole file; correctness never
    * depends on format. */
  private def footerStart(len: Long, tail8: Array[Byte]): Long =
    if (len < 12) 0L
    else {
      val fl = java.nio.ByteBuffer.wrap(tail8, 0, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      if (fl < 0 || fl > len - 8) 0L else len - 8 - fl
    }

  private def footerBytes(f: java.io.File): Array[Byte] = {
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val len = raf.length()
      val start =
        if (len < 12) 0L
        else {
          raf.seek(len - 8)
          val b = new Array[Byte](8)
          raf.readFully(b)
          footerStart(len, b)
        }
      raf.seek(start)
      val out = new Array[Byte]((len - start).toInt)
      raf.readFully(out)
      out
    } finally raf.close()
  }

  // string-match, not java.net.URI: URI.new throws on legal local
  // paths containing spaces etc., which the java.io fast path accepts
  private def hasScheme(p: String): Boolean =
    p.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")

  private def walkFs(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    if (st.isDirectory)
      fs.listStatus(st.getPath).toSeq.sortBy(_.getPath.getName)
        .flatMap(walkFs(fs, _))
    else Seq(st)

  private def footerBytesFs(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Array[Byte] = {
    val len = st.getLen
    val in = fs.open(st.getPath)
    try {
      val start =
        if (len < 12) 0L
        else {
          val b = new Array[Byte](8)
          in.readFully(len - 8, b)
          footerStart(len, b)
        }
      val out = new Array[Byte]((len - start).toInt)
      in.readFully(start, out)
      out
    } finally in.close()
  }

  /** 32-hex-char fingerprint of the parquet trees at `paths` (files or
    * directories), order-sensitive so callers pass a canonical order.
    * `hadoopConf` is consulted only for scheme-qualified paths and
    * defaults to the ACTIVE session's hadoopConfiguration — the one
    * carrying `spark.hadoop.*` credentials and nameservice config —
    * falling back to a bare Configuration only when no session exists
    * (every production call site runs driver-side under a session). */
  def of(paths: Seq[String],
      hadoopConf: () => org.apache.hadoop.conf.Configuration =
        () => org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .map(_.sparkContext.hadoopConfiguration)
          .getOrElse(new org.apache.hadoop.conf.Configuration())): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    paths.foreach { p =>
      if (hasScheme(p)) {
        val hp = new org.apache.hadoop.fs.Path(p)
        val fs = hp.getFileSystem(hadoopConf())
        // fail-fast like the local branch (whose footer read throws
        // FileNotFoundException): a mistyped hdfs://s3a:// input must
        // not silently contribute nothing and degenerate every caller
        // to one shared constant key
        require(fs.exists(hp),
          s"Snapshot.of: input $p does not exist — refusing to key " +
            "an artifact on a missing input")
        walkFs(fs, fs.getFileStatus(hp)).foreach { st =>
          // digest the scheme-relative path so file://<dir> and the
          // bare <dir> of the same tree produce the same key stream
          md.update(st.getPath.toUri.getPath.getBytes("UTF-8"))
          md.update(java.nio.ByteBuffer.allocate(8)
            .putLong(st.getLen).array())
          md.update(footerBytesFs(fs, st))
        }
      } else walk(new java.io.File(p)).foreach { f =>
        md.update(f.getPath.getBytes("UTF-8"))
        md.update(java.nio.ByteBuffer.allocate(8)
          .putLong(f.length()).array())
        md.update(footerBytes(f))
      }
    }
    md.digest().map("%02x".format(_)).mkString.take(32)
  }
}
