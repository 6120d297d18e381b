package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text hashing kernels. The HOF pipeline
  * (`transform(split(text,' '), t -> xxhash64(...))` + distinct + sort)
  * allocates a string per token/shingle and dispatches an interpreted
  * lambda per element — twice per self-join side. These run directly on
  * the UTF8String bytes: token boundaries are byte offsets, a word
  * 3-gram is the byte range from token i's start to token i+2's end
  * (single-space separated text), and each range is XXH64-hashed with
  * Spark's seed so results are BIT-IDENTICAL to
  * `xxhash64(concat_ws(" ", slice(tokens, i, 3)))`. */
object TextHashing {
  private val SEED = 42L // org.apache.spark.sql.functions.xxhash64 seed

  private def tokenBounds(s: UTF8String): (Array[Int], Array[Int]) = {
    val n = s.numBytes()
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    var tokenStart = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == ' '.toByte) {
        starts += tokenStart; ends += i; tokenStart = i + 1
      }
      i += 1
    }
    (starts.toArray, ends.toArray)
  }

  private def hashRange(s: UTF8String, from: Int, until: Int): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset + from,
      until - from, SEED)

  /** Sorted distinct XXH64 hashes of all word 3-grams (falls back to the
    * whole text when it has < 3 tokens — same as slice semantics). */
  def shingleHashes3Sorted(s: UTF8String): GenericArrayData = {
    val (starts, ends) = tokenBounds(s)
    val nTok = starts.length
    val set = new java.util.TreeSet[java.lang.Long]()
    if (nTok < 3) {
      set.add(hashRange(s, 0, s.numBytes()))
    } else {
      var i = 0
      while (i + 2 < nTok) {
        set.add(hashRange(s, starts(i), ends(i + 2)))
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Toy BPE merges table, in rank order — the single source of truth
    * shared by the native `graft_bpe_tokens` kernel below and the HOF
    * parity formulation (`LlmExtra.bpeApplyCol`). */
  val bpeMerges: Array[(String, String)] = Array(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("s", "t"), ("an", "d"), ("in", "g"),
    ("o", "u"), ("e", "d"))

  /** BPE tokens of the whole text: words split on single spaces (empty
    * words contribute nothing, matching `flatten` over per-word
    * arrays), each word split to code-point symbols and folded through
    * `bpeMerges` with one greedy left-to-right pass per rank — exactly
    * the HOF `aggregate` chain's semantics (parity-tested), but one
    * imperative pass per rank instead of 12 interpreted lambda folds
    * with per-step array copies (28.7 s → sub-second on the sf0.1
    * bench for identical output). */
  def bpeTokens(s: UTF8String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val words = s.toString.split(" ", -1)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var toks = scala.collection.mutable.ArrayBuffer.empty[String]
        var ci = 0
        while (ci < w.length) {
          val cp = w.codePointAt(ci)
          toks += new String(Character.toChars(cp))
          ci += Character.charCount(cp)
        }
        var mi = 0
        while (mi < bpeMerges.length) {
          val (a, b) = bpeMerges(mi)
          val next = scala.collection.mutable.ArrayBuffer.empty[String]
          var ti = 0
          while (ti < toks.length) {
            val x = toks(ti)
            if (next.nonEmpty && next.last == a && x == b)
              next(next.length - 1) = a + b
            else next += x
            ti += 1
          }
          toks = next
          mi += 1
        }
        toks.foreach(t => out += UTF8String.fromString(t))
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** XXH64 hash per whitespace token (order preserved, duplicates kept)
    * — bit-identical to `transform(split(text,' '), t -> xxhash64(t))`. */
  def tokenHashes(s: UTF8String): GenericArrayData = {
    val (starts, ends) = tokenBounds(s)
    val out = new Array[Long](starts.length)
    var i = 0
    while (i < starts.length) {
      out(i) = hashRange(s, starts(i), ends(i)); i += 1
    }
    new GenericArrayData(out)
  }

  /** (min, distinct-count) of the rolling 8-CHAR window XXH64 hashes —
    * bit-identical to
    * `transform(sequence(1, greatest(length(text)-7, 1)),
    *            i -> xxhash64(substr(text, i, 8)))`
    * reduced by `array_min` / `size(array_distinct(..))`, in one pass
    * with no per-window string or array allocation. substr counts
    * CHARACTERS, so windows are built over char-start byte offsets (for
    * ASCII they coincide with byte offsets); xxhash64(substr) hashes the
    * substring's bytes, which are exactly the byte range between the
    * window's first char start and one-past-last char start. */
  def rollingFingerprint(
      s: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val nBytes = s.numBytes()
    // char-start byte offsets + one-past-end sentinel
    var offs = new Array[Int](math.min(nBytes, 64) + 1)
    var nChars = 0
    var b = 0
    while (b < nBytes) {
      if (nChars == offs.length - 1)
        offs = java.util.Arrays.copyOf(offs, offs.length * 2)
      offs(nChars) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      nChars += 1
    }
    offs(nChars) = nBytes
    // substr(i, 8) clamps at the end: the last full window starts at
    // nChars-7; shorter texts get exactly one (short or empty) window
    val m = math.max(nChars - 7, 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = hashRange(s, offs(math.min(i, nChars)),
        offs(math.min(i + 8, nChars)))
      i += 1
    }
    java.util.Arrays.sort(hs)
    var d = 1
    var j = 1
    while (j < m) { if (hs(j) != hs(j - 1)) d += 1; j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hs(0), d))
  }
}

/** `graft_shingle_hashes3(text)`: sorted distinct 3-gram hashes. */
case class ShingleHashes3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes3"
  override def nullSafeEval(a: Any): Any =
    TextHashing.shingleHashes3Sorted(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashing.shingleHashes3Sorted($a);")
  override protected def withNewChildInternal(c: Expression): ShingleHashes3 =
    copy(child = c)
}

/** `graft_rolling_fp8(text)`: struct(fp_min, fp_distinct) of the
  * rolling 8-char window hashes (winnowing-lite fingerprint). */
case class RollingFp8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fp_min", LongType,
      nullable = false),
    org.apache.spark.sql.types.StructField("fp_distinct",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "graft_rolling_fp8"
  override def nullSafeEval(a: Any): Any =
    TextHashing.rollingFingerprint(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashing.rollingFingerprint($a);")
  override protected def withNewChildInternal(c: Expression): RollingFp8 =
    copy(child = c)
}

/** `graft_token_hashes(text)`: per-token XXH64 hashes. */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"
  override def nullSafeEval(a: Any): Any =
    TextHashing.tokenHashes(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashing.tokenHashes($a);")
  override protected def withNewChildInternal(c: Expression): TokenHashes =
    copy(child = c)
}

/** `graft_bpe_tokens(text)`: BPE tokens over all words (toy embedded
  * merges table, one greedy pass per rank). */
case class BpeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"
  override def nullSafeEval(a: Any): Any =
    TextHashing.bpeTokens(a.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashing.bpeTokens($a);")
  override protected def withNewChildInternal(c: Expression): BpeTokens =
    copy(child = c)
}
