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

object ScaleFunctions {
  def codepoint_entropy(text: Column): Column =
    Bridge.column(CodepointEntropy(Bridge.expression(text)))

  /** Build a key bloom over `keys` (LongType column values already
    * collected as a sketch by `DataFrameStatFunctions.bloomFilter` —
    * the driver holds only the fixed-size bit array). */
  def bloom_might_contain(bloom: BloomFilter, key: Column): Column = {
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    Bridge.column(BloomMightContain(Bridge.expression(key), baos.toByteArray))
  }
}
