package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-hash kernels as custom expressions.
  *
  * The declarative formulations shuffle one row per (doc, token) or
  * (doc, shingle) and aggregate 16–64 columns per document — correct,
  * but the shuffle volume is ~100× the input at 100 TB. Each kernel
  * here folds the whole per-document loop into one narrow expression:
  * no explode, no aggregation, no shuffle at all for the signature
  * stage. Both are bit-compatible with the aggregation forms (pinned
  * by parity specs): same `split(lower(text), "\s+")` tokenization
  * (via the same UTF8String.split the built-in uses), same
  * `XxHash64Function` seed-42 hashing the xxhash64() expression uses.
  *
  * CodegenFallback: the per-row work (regex split + hash loops) is
  * real JVM code either way; falling back costs one boxed call per
  * row, amortized over hundreds of token hashes.
  */
private object TextHash {
  val WS: UTF8String = UTF8String.fromString("\\s+")
  val SPACE: UTF8String = UTF8String.fromString(" ")

  /** Occurrence counts per distinct token. Bit votes are additive in
    * the count, so hashing once per DISTINCT token is semantically
    * identical to hashing every occurrence — and much cheaper on the
    * repetitive corpora the dedup family targets. */
  def countOccurrences(toks: Array[UTF8String]): java.util.LinkedHashMap[UTF8String, Integer] = {
    val m = new java.util.LinkedHashMap[UTF8String, Integer]
    var t = 0
    while (t < toks.length) {
      m.merge(toks(t), Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      t += 1
    }
    m
  }
}

/** 64-bit SimHash of whitespace-tokenized lowercase text: every token
  * occurrence votes ±1 per bit of its xxhash64; the signature is the
  * sign vector. Equals `Dedup.simhashSignaturesAgg`'s per-doc value. */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toLowerCase.split(TextHash.WS, -1)
    val votes = new Array[Int](64)
    // votes are additive in occurrence count, so each DISTINCT token
    // hashes once — repetitive (boilerplate-heavy) documents are
    // exactly this operator's target input
    val counts = TextHash.countOccurrences(toks)
    counts.forEach { (tok, cnt) =>
      val h = XxHash64Function.hash(tok, StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += cnt else votes(j) -= cnt
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))
}

/** md5-bit SimHash: like [[SimHash64]] but every token occurrence's 64
  * vote bits come from its md5 (bit j = bit (j mod 4) of hex nibble
  * (j div 4)) — md5 is byte-identical in every engine, so the DuckDB
  * oracle recomputes the signature from first principles (see
  * `Dedup.simhashPairsMd5`). Tokens are the non-empty `\s+` splits of
  * lowercase text; null when the document has none (the aggregation
  * form drops token-less documents, so pair outputs agree). */
case class Md5SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash64 expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toLowerCase.split(TextHash.WS, -1)
    val votes = new Array[Int](64)
    val md = Md5SimHash64.digest.get()
    var any = false
    // one digest per DISTINCT token; votes weighted by occurrence count
    TextHash.countOccurrences(toks).forEach { (tok, cnt) =>
      if (tok.numBytes() > 0) {
        any = true
        md.reset()
        val d = md.digest(tok.getBytes)
        var j = 0
        while (j < 64) {
          val k = j >> 2 // hex-nibble index; even = high nibble of byte k/2
          val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          if (((nib >> (j & 3)) & 1) == 1) votes(j) += cnt else votes(j) -= cnt
          j += 1
        }
      }
    }
    if (!any) null
    else {
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (votes(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SimHash64 {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  def apply(text: Column): Column =
    Bridge.column(Md5SimHash64(Bridge.expression(text)))
}

/** MinHash signature of the document's `shingleN`-gram set under
  * `numHashes` seeds: min over shingles of xxhash64(shingle, k) —
  * exactly the value `Dedup.minhashSignaturesAgg` computes, without
  * the explode + `numHashes`-column aggregation. Null when the
  * document has fewer than `shingleN` tokens (no shingles — the
  * aggregation form drops such documents entirely). */
case class MinHashSignature(child: Expression, shingleN: Int, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toLowerCase.split(TextHash.WS, -1)
    if (toks.length < shingleN) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= toks.length - shingleN) {
      // duplicate shingles cannot change a min — no distinct needed
      val sh = UTF8String.concatWs(TextHash.SPACE,
        java.util.Arrays.copyOfRange(toks, i, i + shingleN): _*)
      val h1 = XxHash64Function.hash(sh, StringType, 42L)
      var k = 0
      while (k < numHashes) {
        val hk = XxHash64Function.hash(k, IntegerType, h1)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(text: Column, shingleN: Int, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), shingleN, numHashes))
}

/** Distinct word `n`-gram shingles of lowercase whitespace-tokenized
  * text, first-occurrence order — the single-pass form of
  * `TextFunctions.shingleSet` (split + transform + concat_ws +
  * array_distinct, four interpreted HOF traversals per row). Same
  * output array element-for-element (array_distinct also keeps first
  * occurrence), pinned by a parity spec. */
case class ShingleSet(child: Expression, shingleN: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toLowerCase.split(TextHash.WS, -1)
    if (toks.length < shingleN)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= toks.length - shingleN) {
      seen.add(UTF8String.concatWs(TextHash.SPACE,
        java.util.Arrays.copyOfRange(toks, i, i + shingleN): _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {
  def apply(text: Column, shingleN: Int): Column =
    Bridge.column(ShingleSet(Bridge.expression(text), shingleN))
}

/** Row-local Gopher repetition counters: for n ∈ {2, 3}, the document's
  * total n-gram count, distinct n-gram count, and the top n-gram's
  * multiplicity — everything the dup-/top-n-gram quality fractions
  * need, in ONE pass over the row. The declarative formulation
  * shuffled every (doc, n, gram) tuple of the corpus through three
  * aggregations to compute these row-local numbers; this kernel needs
  * no exchange at all (the 100 TB difference).
  *
  * Same tokenization as [[ShingleSet]] (`\s+` split of lowercase,
  * empties kept — identical to `split(lower(text), "\\s+")`), same
  * space-joined grams. Null when the document has fewer than 2 tokens
  * (no 2-grams → the aggregation form emits no row); the n=3 fields
  * are null when there are fewer than 3 tokens. */
case class GopherRepetition(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gopher_repetition expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total_2", LongType, nullable = false),
    StructField("uniq_2", LongType, nullable = false),
    StructField("top_2", LongType, nullable = false),
    StructField("total_3", LongType, nullable = true),
    StructField("uniq_3", LongType, nullable = true),
    StructField("top_3", LongType, nullable = true)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toLowerCase.split(TextHash.WS, -1)
    if (toks.length < 2) return null
    // (total, uniq, top) for width n over the token array
    def stats(n: Int): (Long, Long, Long) = {
      val counts = new java.util.HashMap[UTF8String, Integer]
      var top = 0
      var i = 0
      while (i <= toks.length - n) {
        val sh = UTF8String.concatWs(TextHash.SPACE,
          java.util.Arrays.copyOfRange(toks, i, i + n): _*)
        val c = counts.merge(sh, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (c > top) top = c
        i += 1
      }
      ((toks.length - n + 1).toLong, counts.size.toLong, top.toLong)
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(6)
    val (t2, u2, p2) = stats(2)
    row.update(0, t2); row.update(1, u2); row.update(2, p2)
    if (toks.length >= 3) {
      val (t3, u3, p3) = stats(3)
      row.update(3, t3); row.update(4, u3); row.update(5, p3)
    } // else fields 3..5 stay null (GenericInternalRow initializes null)
    row
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepetition {
  def apply(text: Column): Column =
    Bridge.column(GopherRepetition(Bridge.expression(text)))
}

/** Single-pass BPE encoder: lowercase-alnum word split, per-word
  * character seed, then every merge of the (broadcast one-row) merge
  * table applied in learning order under the greedy left-to-right
  * rule — the whole inference loop of
  * [[graft.operators.Bpe.encode]] as ONE JVM scan per row instead of
  * k interpreted `aggregate`-HOF passes per word (the prior
  * formulation's cost was lambda-interpretation per symbol × merge ×
  * word). Same tokenization as the trainer
  * (`split(lower(text), "[^a-z0-9]+")` via the same UTF8String.split
  * the built-in uses — words are pure ASCII alnum, so seed symbols
  * are single bytes), same pending-symbol greedy semantics as
  * [[graft.operators.Bpe.applyMerge]] (l == r overlaps resolve
  * left-first). Bit-parity with the HOF form is pinned by BpeSpec.
  *
  * `merges`: array<struct<step:int, m_left:string, m_right:string>>,
  * any order — sorted by step here so callers can hand it the raw
  * `collect_list` row. */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.length == 3 && s(0).dataType == IntegerType &&
          s(1).dataType == StringType && s(2).dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "bpe_encode expects (string, array<struct<step int, m_left string, " +
          s"m_right string>>), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(text: Any, mergesAny: Any): Any = {
    // parse + step-sort the (tiny, broadcast) merge table
    val arr = mergesAny.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val step = new Array[Int](k)
    val ml = new Array[UTF8String](k)
    val mr = new Array[UTF8String](k)
    var i = 0
    while (i < k) {
      val m = arr.getStruct(i, 3)
      step(i) = m.getInt(0)
      ml(i) = m.getUTF8String(1)
      mr(i) = m.getUTF8String(2)
      i += 1
    }
    i = 1
    while (i < k) { // insertion sort: k is the merge count (tiny)
      val (s0, l0, r0) = (step(i), ml(i), mr(i))
      var j = i - 1
      while (j >= 0 && step(j) > s0) {
        step(j + 1) = step(j); ml(j + 1) = ml(j); mr(j + 1) = mr(j)
        j -= 1
      }
      step(j + 1) = s0; ml(j + 1) = l0; mr(j + 1) = r0
      i += 1
    }
    val fused = Array.tabulate(k)(j => UTF8String.concat(ml(j), mr(j)))

    val ws = text.asInstanceOf[UTF8String].toLowerCase.split(BpeEncode.SEP, -1)
    val out = new java.util.ArrayList[AnyRef]
    var w = 0
    while (w < ws.length) {
      val word = ws(w)
      val nb = word.numBytes()
      if (nb > 0) {
        // seed: one symbol per character — the word survived an
        // [^a-z0-9]+ split, so every char is one ASCII byte
        val bytes = word.getBytes
        var toks = new Array[UTF8String](nb)
        var c = 0
        while (c < nb) { toks(c) = UTF8String.fromBytes(bytes, c, 1); c += 1 }
        var n = nb
        var m = 0
        while (m < k && n > 1) {
          val l = ml(m); val r = mr(m); val f = fused(m)
          // greedy left-to-right: one pending (not-yet-emitted) symbol;
          // pending l followed by r emits the fusion and clears it
          val nxt = new Array[UTF8String](n)
          var nn = 0
          var pend: UTF8String = null
          var t = 0
          while (t < n) {
            val tok = toks(t)
            if (pend != null && pend.equals(l) && tok.equals(r)) {
              nxt(nn) = f; nn += 1; pend = null
            } else {
              if (pend != null) { nxt(nn) = pend; nn += 1 }
              pend = tok
            }
            t += 1
          }
          if (pend != null) { nxt(nn) = pend; nn += 1 }
          toks = nxt; n = nn
          m += 1
        }
        var e = 0
        while (e < n) { out.add(toks(e)); e += 1 }
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {
  private val SEP: UTF8String = UTF8String.fromString("[^a-z0-9]+")
  def apply(text: Column, merges: Column): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), Bridge.expression(merges)))
}
