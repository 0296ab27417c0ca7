package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BPE tokenization APPLY — segment a
  * whitespace-pre-tokenized document into learned subword symbols, one
  * tight codegen'd pass per row.
  *
  * This is the apply side of the byte-pair-encoding tokenizer story
  * ([[graft.pipeline.Bpe.bpeTrain]] learns the merge table): per word,
  * start from code points and repeatedly merge the PRESENT adjacent
  * pair with the lowest merge rank, all left-to-right non-overlapping
  * occurrences at once, until no ranked pair remains — the canonical
  * subword-unit algorithm of the published BPE tokenizers. Unseen
  * words segment gracefully (merges apply where they can; the
  * remainder stays finer-grained), which is the property that makes a
  * learned subword vocabulary closed over ANY future corpus.
  *
  * Rank-order equivalence (the oracle bridge): applying the merges
  * SEQUENTIALLY in rank order — the form a SQL replay unrolls — gives
  * the same segmentation whenever each rule's components exist before
  * the rule fires, which holds for tables learned by `bpeTrain` on the
  * corpus being segmented (training state IS the segmentation; the
  * parity is test-pinned and q119 hash-checks it against the unrolled
  * SQL).
  *
  * Scale shape: the merge table is a CONFIG-sized literal (nMerges
  * rules — the tokenizer's vocab budget, fixed at training time, same
  * de-literalization status as the PQ codebooks and the JL matrix),
  * resolved once at analysis time into a rank map; per row the loop
  * allocates only the output. A per-JVM word→segmentation memo
  * (bounded, concurrent) exploits the Zipfian repetition of natural
  * text — the standard tokenizer-side cache.
  *
  * SQL shape: `bpe_encode(text, lefts, rights)` with the two symbol
  * arrays foldable literals in rank order; returns array<string> of
  * subword symbols in document order (words are single-space-separated
  * fields of the trimmed text, empties skipped — the family's
  * whitespace contract), null input → null, token-less text → empty
  * array. */
case class BpeEncode(child: Expression, table: BpeOps.MergeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeOps.encodeDoc(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table, classOf[BpeOps.MergeTable].getName)
    defineCodeGen(ctx, ev, in => s"graft.plans.BpeOps.encodeDoc($in, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** BYTE-LEVEL sibling of [[BpeEncode]] — the apply side of
  * [[graft.pipeline.Bpe.bpeTrainBytes]]: GPT-2-style pretokenizer
  * (spaces ride inside pretokens, nothing is dropped), UPPERCASE-HEX
  * UTF-8 byte symbols, same lowest-rank merge loop. Vocabulary closed
  * over arbitrary bytes: ANY input — unseen unicode included —
  * decomposes to byte symbols, never UNK. SQL:
  * `bpe_encode_bytes(text, lefts, rights)` → array<string> of hex
  * symbols in document order. */
case class BpeEncodeBytes(child: Expression, table: BpeOps.MergeTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_bytes requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_bytes"

  override protected def nullSafeEval(input: Any): Any =
    BpeOps.encodeDocBytes(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table, classOf[BpeOps.MergeTable].getName)
    defineCodeGen(ctx, ev, in => s"graft.plans.BpeOps.encodeDocBytes($in, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeBytes =
    copy(child = newChild)
}

object BpeOps {

  /** Resolved merge table: rules in rank order (rank = list position,
    * lower merges first). The rank map and the word memo are rebuilt
    * per JVM (`@transient lazy`); equality is structural on the rule
    * list, so equal tables canonicalize to equal plans (the cacheOnce
    * memo contract [[IvfAssign.Quantizer]] documents). */
  case class MergeTable(rules: Seq[(String, String)]) extends Serializable {
    @transient lazy val ranks: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](rules.size * 2)
      rules.zipWithIndex.foreach { case (lr, i) =>
        // first (lowest) rank wins on a duplicated pair
        if (!m.containsKey(lr)) m.put(lr, Integer.valueOf(i))
      }
      m
    }
    @transient lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  }

  private val MemoCap = 1 << 16

  /** Static helper invoked from generated code: whole-document encode
    * (single-space word fields of the trimmed text, empties skipped),
    * flattened subword symbols in document order. */
  def encodeDoc(text: UTF8String, table: MergeTable): ArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      if (j > i) out ++= encodeWordMemo(s.substring(i, j), table)
      i = j
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWordMemo(word: String, table: MergeTable): Array[UTF8String] = {
    val memo = table.memo
    val hit = memo.get(word)
    if (hit != null) return hit
    val enc = encodeWord(word, table).map(UTF8String.fromString)
    if (memo.size >= MemoCap) memo.clear()
    memo.put(word, enc)
    enc
  }

  /** GPT-2-style pretokenizer pattern — MUST stay textually identical
    * to [[graft.pipeline.Bpe.pretokenRegex]] (leftmost-first
    * alternation, same semantics in Java regex and RE2). */
  private val Pretoken =
    java.util.regex.Pattern.compile(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +")

  /** Static helper invoked from generated code: BYTE-LEVEL document
    * encode — pretokenize with [[Pretoken]], hex-byte symbols per
    * pretoken, flattened in document order. Spaces are carried INSIDE
    * pretokens (the " ?..." alternatives), so unlike the whitespace
    * family nothing is skipped: decode reproduces the text byte for
    * byte. */
  def encodeDocBytes(text: UTF8String, table: MergeTable): ArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val m = Pretoken.matcher(s)
    while (m.find()) {
      val w = m.group()
      if (w.nonEmpty) out ++= encodeWordBytesMemo(w, table)
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def encodeWordBytesMemo(word: String, table: MergeTable): Array[UTF8String] = {
    val memo = table.memo
    val hit = memo.get(word)
    if (hit != null) return hit
    val enc = encodeWordBytes(word, table).map(UTF8String.fromString)
    if (memo.size >= MemoCap) memo.clear()
    memo.put(word, enc)
    enc
  }

  /** Canonical per-word BPE: code-point symbols, then repeatedly merge
    * every left-to-right non-overlapping occurrence of the PRESENT
    * pair with the lowest rank. */
  private[plans] def encodeWord(word: String, table: MergeTable): Array[String] = {
    // code-point split (the unit of `.` in both Java and RE2 regexes —
    // the training side splits with regexp_extract_all(w, '.'))
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    var si = 0
    while (si < word.length) {
      val cp = word.codePointAt(si)
      val w = Character.charCount(cp)
      b += word.substring(si, si + w)
      si += w
    }
    mergeLoop(b, table)
  }

  private val HexDigits = "0123456789ABCDEF".toCharArray

  /** Byte-level per-word BPE: UPPERCASE-HEX byte symbols (the
    * [[graft.pipeline.Bpe.bpeTrainBytes]] universe — one 2-hex-char
    * symbol per UTF-8 byte, merges concatenate hex), same lowest-rank
    * merge loop. */
  private[plans] def encodeWordBytes(word: String, table: MergeTable): Array[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = new scala.collection.mutable.ArrayBuffer[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      b += new String(Array(HexDigits(v >> 4), HexDigits(v & 0xf)))
      i += 1
    }
    mergeLoop(b, table)
  }

  /** The shared lowest-rank-repeat merge loop over an initial symbol
    * buffer (code points or hex bytes — the loop is
    * alphabet-agnostic). */
  private def mergeLoop(syms0: scala.collection.mutable.ArrayBuffer[String],
                        table: MergeTable): Array[String] = {
    var syms = syms0
    val ranks = table.ranks
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val l = syms(bi)
        val r = syms(bi + 1)
        val merged = l + r
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += merged; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
        if (syms.length < 2) done = true
      }
    }
    syms.toArray
  }

  private def tableFromArgs(exprs: Seq[Expression], name: String): MergeTable = {
    require(exprs.length == 3, s"$name takes (text, lefts, rights), got ${exprs.length}")
    def strings(e: Expression, what: String): Seq[String] = {
      require(e.foldable, s"$name $what must be a literal array")
      e.eval() match {
        case a: ArrayData => a.toObjectArray(StringType)
          .map(_.asInstanceOf[UTF8String].toString).toSeq
        case other => throw new IllegalArgumentException(
          s"$name $what: expected array literal, got $other")
      }
    }
    val lefts = strings(exprs(1), "lefts")
    val rights = strings(exprs(2), "rights")
    require(lefts.length == rights.length,
            s"$name rule arrays must align (${lefts.length} vs ${rights.length})")
    MergeTable(lefts.zip(rights))
  }

  /** Builder for the function registry: collapses the two foldable
    * symbol-array literals into a [[MergeTable]] at analysis time. */
  def fromArgs(exprs: Seq[Expression]): BpeEncode =
    BpeEncode(exprs.head, tableFromArgs(exprs, "bpe_encode"))

  /** Byte-level builder ([[BpeEncodeBytes]]). */
  def fromArgsBytes(exprs: Seq[Expression]): BpeEncodeBytes =
    BpeEncodeBytes(exprs.head, tableFromArgs(exprs, "bpe_encode_bytes"))
}
