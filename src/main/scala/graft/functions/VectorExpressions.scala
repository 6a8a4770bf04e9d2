package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path
  * (SURVEY.md §2.3): a fused dot/norm/cosine kernel that stays inside
  * whole-stage codegen. The `aggregate(zip_with(...))` formulation walks
  * interpreted lambda closures per element; these emit a single primitive
  * Java loop instead — the "(b) custom Catalyst Expression beats a UDF"
  * tier of the extension ladder.
  *
  * Both accumulate strictly in index order, so results are bit-identical
  * to the sequential-fold formulation the DuckDB oracles use.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** dot_product(a, b) = Σ aᵢ·bᵢ over the common prefix. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += xa.getDouble(i) * xb.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_sim(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), single fused loop; 0.0
  * when either norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xa.getDouble(i); val y = xb.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0D) ? 0.0D : ($dot / $denom);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** nearest_cells(v) = the `nprobe` centroid indices nearest to `v` by
  * squared L2, ascending by (distance, index) — the IVF probe-selection
  * kernel. The centroid matrix rides along as a PLAN CONSTANT (a codegen
  * reference object), replacing the literal-expression formulation that
  * built `nlist` structs × `d` literal leaves: at the 1M-vector tier's
  * nlist ≈ 1000 that tree is ~10⁵ Catalyst nodes — minutes of analysis
  * and a guaranteed codegen fallback — while this expression is one
  * node and one fused primitive loop regardless of nlist.
  *
  * Bit-compatibility contract (OpsSpec property-tests it): distances
  * accumulate (x−c)² strictly in index order — the same IEEE sequence
  * as `aggregate(zip_with(v, c, (x,cc) -> (x-cc)*(x-cc)), 0D, +)` — and
  * the bounded insertion sort orders exactly like `array_sort` on
  * (dist, cell) structs: ascending distance, lower cell first on ties. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  // np = 0 (empty centroid matrix, or nprobe <= 0) short-circuits to an
  // empty array in BOTH eval paths: the insertion-buffer code indexes
  // bd[np-1], which would throw AIOOBE at runtime — internal callers
  // guard empty corpora, but the public facade must not crash (ADVICE
  // r14)
  private def np: Int = math.max(0, math.min(nprobe, centroids.length))

  override def nullSafeEval(v: Any): Any = {
    if (np == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyIntArray)
    val xa = v.asInstanceOf[ArrayData]
    val m = np
    val bd = Array.fill(m)(Double.PositiveInfinity)
    val bc = new Array[Int](m)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(xa.numElements(), cen.length)
      var s = 0.0
      var j = 0
      while (j < n) { val d = xa.getDouble(j) - cen(j); s += d * d; j += 1 }
      if (s < bd(m - 1)) { // strict: ties keep the earlier (lower) cell
        var p = m - 1
        while (p > 0 && s < bd(p - 1)) { bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1 }
        bd(p) = s; bc(p) = c
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (np == 0) {
      // degenerate geometry is a compile-time constant: emit the empty
      // array directly instead of a loop that would index bd[-1]
      return nullSafeCodeGen(ctx, ev, _ =>
        s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  new int[0]);""".stripMargin)
    }
    val cenRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val cen = ctx.freshName("cen")
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      s"""
         |final double[][] $cen = $cenRef;
         |final double[] $bd = new double[$np];
         |final int[] $bc = new int[$np];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |for (int $c = 0; $c < $cen.length; $c++) {
         |  final double[] $row = $cen[$c];
         |  final int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final double $d = $a.getDouble($j) - $row[$j];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bd[$np - 1]) {
         |    int $p = $np - 1;
         |    while ($p > 0 && $s < $bd[$p - 1]) {
         |      $bd[$p] = $bd[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $s; $bc[$p] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bc);
       """.stripMargin
    })
  }

  // the centroid matrix is a plan constant, not a child — only `child`
  // participates in tree transforms
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API facade + registration. `GraftExtensions` is the
  * `spark.sql.extensions` entry point; `register` injects into an
  * already-built session (idempotent). */
object VectorFunctions {

  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Column-API only (the centroid matrix is a Scala-side plan
    * constant; there is no SQL-literal syntax for double[][]). */
  def nearest_cells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(v), centroids, nprobe))

  /** Literal-string / literal-int argument extraction for the SQL
    * builders whose expressions take plan constants (probe phrase,
    * sketch geometry). */
  private def litString(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal argument, got $other")
  }

  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got $other")
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("codepoint_entropy"),
      new ExpressionInfo(classOf[CodepointEntropy].getName, "codepoint_entropy"),
      (args: Seq[Expression]) => CodepointEntropy(args(0))),
    (FunctionIdentifier("phrase_positions"),
      new ExpressionInfo(classOf[PhrasePositions].getName, "phrase_positions"),
      (args: Seq[Expression]) => PhrasePositions(args(0),
        litString(args(1), "phrase_positions"), litString(args(2), "phrase_positions"))),
    (FunctionIdentifier("winnow_sketch"),
      new ExpressionInfo(classOf[WinnowSketch].getName, "winnow_sketch"),
      (args: Seq[Expression]) => WinnowSketch(args(0),
        litInt(args(1), "winnow_sketch"), litInt(args(2), "winnow_sketch"))))

  /** Register into a live session (SQL name + Column API both work). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      Bridge.registerFunction(spark, ident.funcName, info, builder)
    }

  /** Inject the same registry through `spark.sql.extensions`. */
  def injectAll(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    VectorFunctions.injectAll(ext)
}
