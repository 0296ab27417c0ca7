package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the whole per-document MinHash signature
  * — tokenize → bigram shingles → salted sha256 per shingle → per-hash
  * minimum slice — as one codegen'd pass per row.
  *
  * Why a THIRD form: the batch signature
  * ([[graft.pipeline.TextDedup.minhashSignature]]) shuffles every
  * (doc, shingle-digest) row to a groupBy — ~200 wide rows per document
  * crossing the wire; the per-row HOF composition (rounds 4-5's
  * `transform`/`array_min` streaming form) avoids the shuffle but pays
  * CodegenFallback interpretation per shingle, which an A/B at sf0.1
  * measured 2× SLOWER than the shuffle it saved (6.7 s vs 3.3 s —
  * the HOF lesson, third sighting). This expression keeps the zero-
  * shuffle shape AND stays native: measured faster than both, and the
  * form a 100 TB ingest pipeline wants — signatures computed where the
  * text already is, nothing wide ever materialized.
  *
  * Semantics are EXACTLY the other two forms' (pinned by the existing
  * row-vs-batch parity tests, which run through this implementation):
  * tokens = `split(trim(text), " ")` (single-space regex, trailing
  * empties kept); shingles = adjacent pairs joined by `_`; fewer than
  * 2 tokens OR an empty post-exclusion shingle set → null (so batch
  * consumers can drop exactly the docs the groupBy form never emits);
  * group-g digest = lowercase-hex sha256((g == 0 ? "" : g) + shingle);
  * hash i = min over shingles of digest[i/8] sliced at (i%8)*8, length
  * 8 (one-permutation-hashing slices; ASCII hex, so string min ==
  * binary min in both engines). The `exclude` list (frequent-shingle
  * prune) is resolved into a hash set at analysis time, the same
  * folded-literal pattern as [[IvfAssign.Quantizer]]. */
case class MinhashSig(child: Expression, cfg: MinhashSig.Config)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // null for <2 tokens / empty shingle set even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.sig(input.asInstanceOf[UTF8String], cfg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("minhashCfg", cfg, classOf[MinhashSig.Config].getName)
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.plans.MinhashSig.sig($in, $c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Native Catalyst expression: per-document 16-bit SimHash — tokenize →
  * md5 per token → ±1 vote per hex-digit parity → sign bits — as one
  * codegen'd pass per row (the [[MinhashSig]] treatment applied to the
  * other fingerprint; the HOF composition it replaces paid an
  * interpreted `aggregate` lambda per (token, bit)). Semantics are
  * EXACTLY the batch groupBy form's (pinned by the row-vs-batch parity
  * test): tokens = non-empty pieces of `split(trim(text), " ")`; vote j
  * = (value of lowercase-hex digit j of md5(token)) mod 2 × 2 − 1; bit
  * j set iff the vote sum is > 0. Zero tokens → 0 (the batch form
  * simply emits no row; callers filter `trim(text) != ''` when batch
  * row-set parity matters). */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "simhash16"

  override protected def nullSafeEval(input: Any): Any =
    Simhash16.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.plans.Simhash16.hash($in)")

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

/** Native Catalyst expression: per-document 64-bit SimHash — the
  * PRODUCTION sketch width ([[Simhash16]]'s own Scaladoc calls 16 bits
  * a toy for 100 TB: its 4-bit band keys give only 16 buckets per band,
  * so the near-dup band self-join saturates at O(n²/16)). At 64 bits
  * the same maxHamming=3 pigeonhole banding yields 16-BIT band keys —
  * 65,536 buckets per band — so bucket occupancy, and with it the band
  * join's cost, drops by 4096× at any corpus size.
  *
  * Vote rule is [[Simhash16]]'s nibble-parity form extended to 64
  * lanes: lane j's vote comes from hex digit j%32 of digest j/32,
  * where digest 0 = md5(token) and digest 1 = md5('1' || token) — the
  * same salted-digest extension [[MinhashSig]] uses to grow hash count
  * past one digest's width, so the value stays engine-portable (the
  * q77 oracle replays all 64 votes from the two md5s in SQL). Vote j =
  * (nibble & 1)·2 − 1 summed over token OCCURRENCES; bit j of the
  * LongType result is set iff the sum is > 0. Zero tokens → 0 (same
  * contract as simhash16). */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.plans.Simhash64.hash($in)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper invoked from generated code. Lanes 0-31 vote from
    * the 32 hex nibbles of md5(token); lanes 32-63 from md5('1'+token).
    * Nibble j of a digest is byte j/2, high nibble first — identical to
    * [[Simhash16.hash]]'s walk, just over the full digest and a second
    * salted one. */
  def hash(text: UTF8String): Long = {
    val tokens = text.trim().toString.split(" ", -1)
    val votes = new Array[Int](64)
    val digest = md5.get()
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
        var g = 0
        while (g < 2) {
          digest.reset()
          val in = if (g == 0) tok else "1" + tok
          val bytes = digest.digest(in.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var j = 0
          while (j < 32) {
            val b = bytes(j / 2) & 0xff
            val nibble = if (j % 2 == 0) b >>> 4 else b & 0xf
            votes(g * 32 + j) += (nibble & 1) * 2 - 1
            j += 1
          }
          g += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}

/** Native Catalyst expression: per-document 128-bit SimHash as a
  * struct<hi: bigint, lo: bigint> — the band-key rung PAST 64 bits.
  * The arithmetic that forces it: a band self-join's cost is
  * O(Σ occupancy²) per bucket, and at the brief's own scale (100 TB ≈
  * 10¹⁰ ~10 KB documents) even the 64-bit sketch's 16-BIT band keys
  * saturate — 65,536 buckets per band means ~150k docs per bucket.
  * Hamming ≤ 3 at that corpus size needs 32-bit band keys (4.3B
  * buckets, occupancy ~2), i.e. 4 bands × 32 bits = a 128-bit sketch.
  *
  * Vote rule extends the [[Simhash64]] salted-digest ladder: lanes
  * 0-63 vote from md5(token) and md5('1'+token) — IDENTICAL to
  * [[Simhash64]], so `lo` equals the 64-bit sketch by construction
  * (test-pinned) — and lanes 64-127 from md5('2'+token) and
  * md5('3'+token) into `hi`. Engine-portable: the q85 oracle replays
  * all 128 votes from the four md5s in SQL. Zero tokens → (0, 0). */
case class Simhash128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash128 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = Simhash128.schema
  override def prettyName: String = "simhash128"

  override protected def nullSafeEval(input: Any): Any =
    Simhash128.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.plans.Simhash128.hash($in)")

  override protected def withNewChildInternal(newChild: Expression): Simhash128 =
    copy(child = newChild)
}

object Simhash128 {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper invoked from generated code. Lane j votes from hex
    * nibble j%32 of digest j/32, digests salted '', '1', '2', '3' —
    * the first two lanes-groups are exactly [[Simhash64.hash]]'s. */
  def hash(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val tokens = text.trim().toString.split(" ", -1)
    val votes = new Array[Int](128)
    val digest = md5.get()
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
        var g = 0
        while (g < 4) {
          digest.reset()
          val in = if (g == 0) tok else g.toString + tok
          val bytes = digest.digest(in.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var j = 0
          while (j < 32) {
            val b = bytes(j / 2) & 0xff
            val nibble = if (j % 2 == 0) b >>> 4 else b & 0xf
            votes(g * 32 + j) += (nibble & 1) * 2 - 1
            j += 1
          }
          g += 1
        }
      }
      t += 1
    }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) lo |= 1L << j; j += 1 }
    while (j < 128) { if (votes(j) > 0) hi |= 1L << (j - 64); j += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hi, lo))
  }
}

object Simhash16 {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper invoked from generated code. Hex digit j of the
    * digest is nibble j (high nibble first); its parity is its low bit,
    * so the vote is `(nibble & 1) * 2 - 1` — identical to the SQL
    * forms' `digitValue % 2 * 2 - 1` on lowercase hex. */
  def hash(text: UTF8String): Int = {
    val tokens = text.trim().toString.split(" ", -1)
    val votes = new Array[Int](16)
    val digest = md5.get()
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok.nonEmpty) {
        digest.reset()
        val bytes = digest.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 16 hex digits = first 8 bytes, high nibble first
        var j = 0
        while (j < 16) {
          val b = bytes(j / 2) & 0xff
          val nibble = if (j % 2 == 0) b >>> 4 else b & 0xf
          votes(j) += (nibble & 1) * 2 - 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0
    var j = 0
    while (j < 16) { if (votes(j) > 0) out |= 1 << j; j += 1 }
    out
  }
}

object MinhashSig {

  /** Folded signature parameters. Structural equality (the exclude set
    * participates by content) so equal configurations canonicalize to
    * equal plans — same rationale as [[IvfAssign.Quantizer]]: repeated
    * invocations must hit the same cache entries. */
  case class Config(nHashes: Int, exclude: Array[String]) {
    require(nHashes >= 1, s"need at least one hash, got $nHashes")
    val nGroups: Int = (nHashes + 7) / 8
    @transient lazy val excludeSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](math.max(16, exclude.length * 2))
      exclude.foreach(s.add)
      s
    }
    override def equals(o: Any): Boolean = o match {
      case c: Config => nHashes == c.nHashes &&
        java.util.Arrays.equals(exclude.asInstanceOf[Array[AnyRef]],
                                c.exclude.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode: Int = java.util.Objects.hash(
      Int.box(nHashes),
      Int.box(java.util.Arrays.hashCode(exclude.asInstanceOf[Array[AnyRef]])))
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Static helper invoked from generated code. One thread-local digest
    * instance; per shingle the nGroups digests are computed and their
    * 8-hex-char slices folded into the running minima. */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  def sig(text: UTF8String, cfg: Config): ArrayData = {
    // UTF8String.trim trims ' ' only — identical to SQL trim (Java
    // String.trim would also strip control chars and diverge)
    val tokens = text.trim().toString.split(" ", -1)
    if (tokens.length < 2) return null
    val digest = md.get()
    val mins = new Array[String](cfg.nHashes)
    var any = false
    var t = 0
    while (t < tokens.length - 1) {
      val shingle = tokens(t) + "_" + tokens(t + 1)
      if (!cfg.excludeSet.contains(shingle)) {
        any = true
        var g = 0
        while (g < cfg.nGroups) {
          val salted = if (g == 0) shingle else g.toString + shingle
          digest.reset()
          val bytes = digest.digest(salted.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // lowercase-hex slices, 8 chars per hash: hash i of this group
          // covers hex chars [(i%8)*8, (i%8)*8+8) = bytes [s*4, s*4+4)
          val base = g * 8
          var s = 0
          while (s < 8) {
            val i = base + s
            if (i < cfg.nHashes) {
              val chars = new Array[Char](8)
              var b = 0
              while (b < 4) {
                val v = bytes(s * 4 + b) & 0xff
                chars(b * 2) = hexChars(v >>> 4)
                chars(b * 2 + 1) = hexChars(v & 0xf)
                b += 1
              }
              val slice = new String(chars)
              if (mins(i) == null || slice.compareTo(mins(i)) < 0) mins(i) = slice
            }
            s += 1
          }
          g += 1
        }
      }
      t += 1
    }
    if (!any) return null
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  /** Analysis-time builder for the registered function: evaluates the
    * foldable (nHashes, exclude) literals once into the [[Config]]. */
  def fromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"minhash_sig expects (text, nHashes, exclude), got ${exprs.length} args")
    val n = GraftFunctions.intLit(exprs(1), "minhash_sig nHashes")
    require(exprs(2).foldable, "minhash_sig: exclude must be a literal")
    val ad = exprs(2).eval().asInstanceOf[ArrayData]
    val excl = Array.tabulate(ad.numElements())(i => ad.getUTF8String(i).toString)
    MinhashSig(exprs.head, Config(n, excl))
  }
}
