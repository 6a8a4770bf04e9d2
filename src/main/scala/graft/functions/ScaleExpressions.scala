package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Shannon entropy of a string's Unicode codepoint distribution, in
  * bits per character (engine extension past the reference store,
  * `TimeSeriesFunctions_GPL_0.5.1.R:16-40`): the classic
  * "compressibility" quality screen a training pipeline runs to drop
  * repetitive boilerplate (low H) and binary-ish noise (anomalously
  * high H). The alternative Spark formulation —
  * `explode(split(text,''))` → two `groupBy`s — shuffles one row per
  * (doc, distinct char); this expression is a single codegen'd pass
  * over the row, no shuffle at all, which is the difference between a
  * free column and a corpus-sized exchange at 100 TB.
  *
  * Determinism contract (the DuckDB oracle quantizes at 1e-6): terms
  * are accumulated in ascending-codepoint order via a sort, so the
  * double result is a fixed function of the codepoint multiset, never
  * of row layout or partitioning. Codepoints (not UTF-8 bytes) are the
  * unit so the definition is encoding-independent and matches the
  * oracle's `unicode(char)` exactly on non-ASCII input too.
  */
object TextEntropy {
  /** H = log2(n) − (Σ c·log2 c)/n over codepoint run-lengths c;
    * empty → 0.0. Static so generated code can call it directly. */
  def entropyBits(s: UTF8String): Double = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return 0.0
    val cps = new Array[Int](n)
    var i = 0; var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    val ln2 = math.log(2.0)
    var sum = 0.0
    var run = 1
    i = 1
    while (i <= n) {
      if (i < n && cps(i) == cps(i - 1)) run += 1
      else { sum += run * (math.log(run.toDouble) / ln2); run = 1 }
      i += 1
    }
    (math.log(n.toDouble) / ln2) - sum / n
  }
}

/** codepoint_entropy(text): DoubleType, null-intolerant. The heavy
  * lifting is a static call — one invocation per row from inside
  * whole-stage codegen, the same shape Spark's own `StaticInvoke`
  * expressions compile to. */
case class CodepointEntropy(child: Expression) extends UnaryExpression {
  override def prettyName: String = "codepoint_entropy"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"codepoint_entropy requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextEntropy.entropyBits(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextEntropy.entropyBits($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tokenizer + adjacency scan for the positional phrase search, fused
  * into one pass over the raw string (`[a-z0-9]+` runs on the
  * lowercased text, exactly the oracle's `regexp_extract_all`
  * tokenization). The composed-builtin formulation
  * (`regexp_extract_all` → `sequence` → higher-order `filter`) was the
  * whole suite's slowest query at sf0.1 (3.4 s): Spark's higher-order
  * lambdas evaluate INTERPRETED, one closure call per token index, and
  * the position array materializes per row. This helper is one static
  * call per row from inside whole-stage codegen.
  */
object TextPhrase {
  private val Token = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** 0-based token positions where tokens (i, i+1) == (w1, w2). */
  def phrasePositions(s: UTF8String, w1: String, w2: String): Array[Int] = {
    val m = Token.matcher(s.toString.toLowerCase(java.util.Locale.ROOT))
    val out = new scala.collection.mutable.ArrayBuffer[Int](4)
    var idx = -1
    var prev: String = null
    while (m.find()) {
      idx += 1
      val cur = m.group()
      if (idx > 0 && prev == w1 && cur == w2) out += idx - 1
      prev = cur
    }
    out.toArray
  }
}

/** phrase_positions(text): array<int> of 0-based first-word token
  * positions of the (w1, w2) phrase. The phrase words are expression
  * parameters (plan constants), not children — the probe phrase is
  * fixed per query. */
case class PhrasePositions(child: Expression, w1: String, w2: String)
    extends UnaryExpression {
  override def prettyName: String = "phrase_positions"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_positions requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      TextPhrase.phrasePositions(v.asInstanceOf[UTF8String], w1, w2))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w1Ref = ctx.addReferenceObj("phraseW1", w1, "java.lang.String")
    val w2Ref = ctx.addReferenceObj("phraseW2", w2, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
         |  graft.functions.TextPhrase.phrasePositions($c, $w1Ref, $w2Ref));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bloom_might_contain(key): the probe side of a runtime semi-join
  * filter. `bits` is a serialized `org.apache.spark.util.sketch
  * .BloomFilter` built over the build side's join keys (a mergeable
  * sketch — the build is a map-side partial aggregate tree, never a
  * key shuffle). The filter object itself rides the expression as a
  * plan reference (`ctx.addReferenceObj`), so the probe is one
  * codegen'd `mightContainLong` per row — the pattern that lets a
  * 100 TB fact scan drop non-matching rows BEFORE the join shuffle,
  * at a bit-array cost independent of key cardinality. False
  * positives are fine by contract: the consumer re-joins exactly, so
  * the bloom only ever prunes, never decides membership.
  */
case class BloomMightContain(child: Expression, bits: Array[Byte]) extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused rolling-hash winnowing sketch: the bottom-`size` xxhash64
  * values over all k-char windows of a string, plus the window count —
  * one static call per row. The composed-builtin formulation
  * (`sequence` → higher-order `transform` → `array_sort` → `slice`)
  * pays one INTERPRETED closure call per character-window (the
  * `phrase_search` lesson again — measured 2.4 s at sf0.1 for ~1.5M
  * window hashes) and materializes the full window-hash array per row;
  * this kernel keeps a `size`-slot insertion buffer and never
  * allocates beyond it. Hash identity is preserved exactly:
  * `XxHash64Function.hash(substringSQL(i, k), seed 42)` is
  * byte-for-byte what `xxhash64(substring(txt, i, k))` computes, so
  * sketches (and every downstream overlap pair) are unchanged. */
object TextWinnow {
  def sketchRow(s: UTF8String, k: Int, size: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val n = s.numChars()
    val nw = math.max(n - k + 1, 1)
    // one boundary walk: byte offset of every character start, so each
    // window hashes its raw byte range in place — no per-window
    // UTF8String allocation, no Any-boxing through the hash dispatch
    // (hash identity: xxhash64(substring(txt,i,k)) IS XXH64 seed 42
    // over exactly these bytes)
    val starts = new Array[Int](n + 1)
    var bi = 0
    var ci = 0
    while (ci < n) {
      starts(ci) = bi
      bi += UTF8String.numBytesForFirstByte(s.getByte(bi))
      ci += 1
    }
    starts(n) = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val buf = new Array[Long](math.min(nw, size))
    var filled = 0
    var i = 0
    while (i < nw) {
      val b0 = starts(i)
      val b1 = starts(math.min(i + k, n))
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + b0, b1 - b0, 42L)
      if (filled < buf.length) {
        var pos = filled
        while (pos > 0 && buf(pos - 1) > h) { buf(pos) = buf(pos - 1); pos -= 1 }
        buf(pos) = h
        filled += 1
      } else if (buf.length > 0 && h < buf(buf.length - 1)) {
        var pos = buf.length - 1
        while (pos > 0 && buf(pos - 1) > h) { buf(pos) = buf(pos - 1); pos -= 1 }
        buf(pos) = h
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf), nw.toLong))
  }
}

/** winnow_sketch(text, k, size): struct<hashes: array<long>,
  * n_windows: long> — null-intolerant; (k, size) are plan constants. */
case class WinnowSketch(child: Expression, k: Int, sketchSize: Int)
    extends UnaryExpression {
  override def prettyName: String = "winnow_sketch"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("hashes",
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
      nullable = false),
    org.apache.spark.sql.types.StructField("n_windows", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_sketch requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextWinnow.sketchRow(v.asInstanceOf[UTF8String], k, sketchSize)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextWinnow.sketchRow($c, $k, $sketchSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused token-trigram term-frequency kernel: tokens, trigram grouping
  * and per-document tf counting in ONE pass over the (already
  * lowercased/trimmed) string — replacing the corpus-scale
  * `posexplode` + per-doc `lead` window + (doc, gram) groupBy lineage
  * the weighted-cosine tier paid to build its tf frame (the suite's
  * slowest query at sf0.1; the `PhrasePositions` lesson applied to
  * n-grams — round-15 verdict ask #5). The in-row TreeMap collapses
  * the per-doc aggregate too, so the frame build is explode-only.
  *
  * Parity contract (OpsSpec pins it against the legacy lineage):
  * tokenization is EXACTLY `split(s, "\\s+")` — the same Java regex
  * `Pattern.split(toString, -1)` Spark's `split` builtin runs — on a
  * string the caller already passed through `lower(trim(coalesce(
  * text, '')))`; grams are `concat_ws(" ", w[i], w[i+1], w[i+2])`;
  * tf is the exact per-(doc, gram) count; dl is the token count. The
  * gram list is emitted in ascending gram order (deterministic row
  * set; consumers aggregate/join, never rely on order). */
object TextTrigram {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def trigramTfRow(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val tokens = Ws.split(s.toString, -1)
    val dl = tokens.length
    val m = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i + 2 < dl) {
      val g = new java.lang.StringBuilder(
        tokens(i).length + tokens(i + 1).length + tokens(i + 2).length + 2)
        .append(tokens(i)).append(' ')
        .append(tokens(i + 1)).append(' ')
        .append(tokens(i + 2)).toString
      m.merge(g, 1L, (a, b) => a + b)
      i += 1
    }
    val rows = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      rows(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      dl, new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)))
  }
}

/** trigram_tf(text): struct<dl: int, grams: array<struct<g: string,
  * tf: long>>> — null-intolerant (callers coalesce). */
case class TrigramTf(child: Expression) extends UnaryExpression {
  override def prettyName: String = "trigram_tf"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("grams",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
        containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_tf requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextTrigram.trigramTfRow(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextTrigram.trigramTfRow($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted-merge positional intersection for k-term phrase matching
  * over a positional postings index (round 18, verdict r17 ask #4 —
  * the upgrade path [[graft.ops.Lexical.searchPhrase]]'s scaladoc
  * promised): given the k SORTED position arrays of a phrase's words
  * within one document (slot i = positions of word i), return the
  * start positions p with p+i present in slot i for every i. One
  * monotone pointer per array — O(Σ|arr_i|) per document, never the
  * O(|p1|·|p2|) of the old per-element `array_contains` lambda, and
  * codegen'd instead of an interpreted higher-order function (the
  * round-9 lambda rule). */
object PhrasePosMerge {
  def hits(arrs: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = arrs.numElements()
    val a = new Array[Array[Int]](k)
    var i = 0
    while (i < k) { a(i) = arrs.getArray(i).toIntArray(); i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int](4)
    if (k > 0) {
      val ptr = new Array[Int](k)
      val first = a(0)
      var j = 0
      var exhausted = false
      while (j < first.length && !exhausted) {
        val p = first(j)
        var ok = true
        i = 1
        while (i < k && ok && !exhausted) {
          val target = p + i
          // p grows monotonically with j, so each pointer only ever
          // advances — the classic k-way merge invariant
          while (ptr(i) < a(i).length && a(i)(ptr(i)) < target) ptr(i) += 1
          if (ptr(i) >= a(i).length) exhausted = true
          else if (a(i)(ptr(i)) != target) ok = false
          i += 1
        }
        if (ok && !exhausted) out += p
        j += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
}

/** phrase_chain_hits(pos_arrays): array<int> of phrase start positions
  * from an array of k per-word sorted position arrays — the codegen
  * wrapper over [[PhrasePosMerge.hits]]. */
case class PhraseChainHits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "phrase_chain_hits"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, _), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_chain_hits requires array<array<int>>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    PhrasePosMerge.hits(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PhrasePosMerge.hits($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScaleFunctions {
  def codepoint_entropy(text: Column): Column =
    Bridge.column(CodepointEntropy(Bridge.expression(text)))

  def winnow_sketch(text: Column, k: Int, sketchSize: Int): Column =
    Bridge.column(WinnowSketch(Bridge.expression(text), k, sketchSize))

  def phrase_positions(text: Column, w1: String, w2: String): Column =
    Bridge.column(PhrasePositions(Bridge.expression(text), w1, w2))

  def phrase_chain_hits(posArrays: Column): Column =
    Bridge.column(PhraseChainHits(Bridge.expression(posArrays)))

  def trigram_tf(text: Column): Column =
    Bridge.column(TrigramTf(Bridge.expression(text)))

  /** Build a key bloom over `keys` (LongType column values already
    * collected as a sketch by `DataFrameStatFunctions.bloomFilter` —
    * the driver holds only the fixed-size bit array). */
  def bloom_might_contain(bloom: BloomFilter, key: Column): Column = {
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    Bridge.column(BloomMightContain(Bridge.expression(key), baos.toByteArray))
  }
}
