package graft.ops

/** Content fingerprints for on-disk parquet inputs, shared by the
  * per-JVM materialized-artifact caches (the dedup cluster table in
  * `LlmExtra`, the trade-graph edge table in `Graph`).
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
  */
private[graft] object Snapshot {
  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory)
      Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
        .flatMap(walk)
    else Seq(f)

  private def footerBytes(f: java.io.File): Array[Byte] = {
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      val len = raf.length()
      // parquet tail = footer, 4-byte LE footer length, "PAR1" magic.
      // A malformed length (not parquet, or corrupt) falls back to
      // hashing the whole file — correctness never depends on format.
      val start =
        if (len < 12) 0L
        else {
          raf.seek(len - 8)
          val b = new Array[Byte](4)
          raf.readFully(b)
          val fl = java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          if (fl < 0 || fl > len - 8) 0L else len - 8 - fl
        }
      raf.seek(start)
      val out = new Array[Byte]((len - start).toInt)
      raf.readFully(out)
      out
    } finally raf.close()
  }

  /** 32-hex-char fingerprint of the parquet trees at `paths` (files or
    * directories), order-sensitive so callers pass a canonical order. */
  def of(paths: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    paths.foreach { p =>
      walk(new java.io.File(p)).foreach { f =>
        md.update(f.getPath.getBytes("UTF-8"))
        md.update(java.nio.ByteBuffer.allocate(8)
          .putLong(f.length()).array())
        md.update(footerBytes(f))
      }
    }
    md.digest().map("%02x".format(_)).mkString.take(32)
  }
}
