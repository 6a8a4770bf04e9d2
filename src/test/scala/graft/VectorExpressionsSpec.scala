package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Native vector expressions: correctness vs the higher-order-function
  * formulation, codegen + interpreted agreement, SQL registration.
  */
class VectorExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  // built WITH the advertised extensions entry point, so this suite also
  // proves `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  // injects the functions at session build (no manual register call)
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.0, 0.0), Array(1.0, 1.0)),
      (3L, Array(2.5), Array(-2.5))
    ).toDF("id", "a", "b")
  }

  test("dot_product and cosine_sim match the zip_with/aggregate formulation bit-exactly") {
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val hofNa = aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val hofNb = aggregate(zip_with(col("b"), col("b"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val rows = df.select(
      VectorFunctions.dot_product(col("a"), col("b")).as("dp"),
      hofDot.as("hofDp"),
      VectorFunctions.cosine_sim(col("a"), col("b")).as("cs"),
      try_divide(hofDot, sqrt(hofNa) * sqrt(hofNb)).as("hofCs")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot parity")
      val hof = if (r.isNullAt(3) || r.getDouble(3).isNaN) 0.0 else r.getDouble(3) // HOF yields null on zero norm
      assert(r.getDouble(2) == hof, s"cosine parity: ${r.getDouble(2)} vs $hof")
    }
  }

  test("nearest_cells with empty centroids or nprobe <= 0 returns an empty array") {
    // ADVICE r14: the insertion buffer indexes bd[np-1]; np = 0 must
    // short-circuit instead of AIOOBE — in BOTH eval paths
    import spark.implicits._
    val base = Seq(Tuple1(Seq(0.1, 0.2))).toDF("v")
    def probe(cents: Array[Array[Double]], np: Int): Seq[Int] =
      base.select(VectorFunctions.nearest_cells(col("v"), cents, np).as("c"))
        .collect()(0).getSeq[Int](0)
    assert(probe(Array.empty[Array[Double]], 3).isEmpty, "empty centroid matrix")
    assert(probe(Array(Array(0.0, 0.0)), 0).isEmpty, "nprobe = 0")
    assert(probe(Array(Array(0.0, 0.0)), -1).isEmpty, "negative nprobe")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(probe(Array.empty[Array[Double]], 3).isEmpty, "interpreted path")
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("codegen and interpreted paths agree") {
    val withCodegen = df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).collect().map(_.getDouble(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(VectorFunctions.cosine_sim(col("a"), col("b"))).collect().map(_.getDouble(0))
      assert(withCodegen.sameElements(interpreted))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("extensions injection: functions resolve in SQL with NO register call") {
    // the session was built with spark.sql.extensions=GraftExtensions;
    // if injection silently failed this resolves to UNRESOLVED_ROUTINE.
    // Guard against a sibling suite's session leaking in (extensions
    // only apply at creation): skip rather than false-pass if so.
    assume(spark.conf.get("spark.sql.extensions", "") ==
      "graft.functions.GraftExtensions", "session not built by this suite")
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("SQL registration: cosine_sim/dot_product callable from spark.sql") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT id, round(cosine_sim(a, b), 6) AS cs, dot_product(a, b) AS dp FROM vecs ORDER BY id")
      .collect()
    assert(r(0).getDouble(2) == 32.0) // 1·4 + 2·5 + 3·6
    assert(r(1).getDouble(1) == 0.0, "zero-norm vector → cosine 0.0")
    assert(r(2).getDouble(1) == -1.0)
  }

  test("SQL registration: text kernels callable from spark.sql") {
    VectorFunctions.register(spark)
    // entropy: 'aabb' -> 1 bit/char; phrase positions; winnow sketch
    val e = spark.sql("SELECT codepoint_entropy('aabb')").head().getDouble(0)
    assert(math.abs(e - 1.0) < 1e-12, s"entropy of aabb is 1 bit/char: $e")
    val p = spark.sql("SELECT phrase_positions('big data big data', 'big', 'data')")
      .head().getSeq[Int](0)
    assert(p == Seq(0, 2), s"phrase at token positions 0 and 2: $p")
    val w = spark.sql(
      "SELECT ws.n_windows, size(ws.hashes) FROM (SELECT winnow_sketch('abcdefghij', 8, 4) AS ws)")
      .head()
    assert(w.getLong(0) == 3L && w.getInt(1) == 3L,
      s"10 chars -> 3 8-char windows, sketch holds all 3: $w")
    // SQL result must equal the Column-API kernel bit-for-bit
    val viaSql = spark.sql("SELECT winnow_sketch('abcdefghij', 8, 4).hashes").head().getSeq[Long](0)
    val viaCol = spark.range(1)
      .select(graft.functions.ScaleFunctions.winnow_sketch(lit("abcdefghij"), 8, 4).getField("hashes"))
      .head().getSeq[Long](0)
    assert(viaSql == viaCol)
  }

  test("nulls propagate; type mismatch is a clean analysis error") {
    import spark.implicits._
    val withNull = Seq((Array(1.0), Option.empty[Array[Double]])).toDF("a", "b")
    val out = withNull.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    val err = intercept[Exception] {
      df.select(VectorFunctions.cosine_sim(col("id"), col("a"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array") || err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
