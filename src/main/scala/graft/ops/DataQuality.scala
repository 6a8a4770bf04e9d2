package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation over the ingest tables — the
  * contract-check suite (completeness, uniqueness, domain, range,
  * referential integrity) a production pipeline runs before any of the
  * engine's operators consume a feed (engine extension past the
  * reference's implicit trust in its store,
  * `TimeSeriesFunctions_GPL_0.5.1.R:23-40`; the check taxonomy follows
  * the public Deequ/Great-Expectations model: each check is a metric
  * plus a predicate over it).
  *
  * Scale posture — the design constraint is that validating 100 TB must
  * cost ONE pass per table plus key-width joins, never a second scan
  * per check:
  *   - All single-table checks against one table fuse into ONE
  *     single-row conditional aggregate (`count_if` per predicate), so
  *     k checks still read the table once. No Expand: the only
  *     `count(DISTINCT)` per aggregate is the table's primary key (a
  *     two-phase partial distinct, not a multi-distinct Expand).
  *   - Referential-integrity checks project BOTH sides to their 8-byte
  *     keys before a left-anti join, so the shuffle carries keys only;
  *     at dimension-sized right sides AQE turns it into a broadcast
  *     anti join for free.
  *   - Composite-key uniqueness aggregates the grouped counts
  *     (`count(*) − |groups|`), a two-phase partial aggregate on the
  *     key — never a window or a self-join.
  *   - Every check row is O(1); the result is O(#checks) rows unioned
  *     from single-row plans.
  *
  * Ratio thresholds (null-budget checks) compare with exact INTEGER
  * cross-multiplication (`nulls * 20 <= rows` ⇔ null share ≤ 5%) — no
  * division, so the verdict cannot flip on an IEEE boundary between
  * engines and the whole row hash-verifies in the driver's DuckDB
  * compare.
  */
object DataQuality {

  /** Per-SOURCE document-length histograms — the grouped form of the
    * equi-width profile (`value_histogram` bins one global axis; feed
    * monitoring wants the shape PER upstream source, each on its own
    * bounds). Binning stays pure integer arithmetic on the exact
    * n_chars column: `bin = (c − lo_g)·10 DIV (hi_g − lo_g + 1)` with
    * group-local bounds attached by a broadcast |sources|-row join; a
    * single-length source degenerates to one bin 0 row. */
  def docLengthHistogram(spark: SparkSession, sfDir: String, bins: Int = 10): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), col("n_chars"))
    val bounds = docs.groupBy(col("source"))
      .agg(min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
    docs.join(broadcast(bounds), "source")
      .select(col("source"),
        expr(s"(n_chars - lo) * $bins DIV (hi - lo + 1)").as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("source"), col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("source"), col("bin"),
        expr(s"lo + bin * (hi - lo + 1) DIV $bins").as("bin_lo_chars"), col("n"))
      .orderBy(col("source"), col("bin"))
  }

  /** k-anonymity audit over the documents table's quasi-identifiers
    * (lang, source, length bucket): any combination shared by fewer
    * than k documents can single out a contributor when joined with an
    * external dataset — the release-gate check privacy reviews run
    * next to the PII scan. One groupBy over the QI key (two-phase
    * count partials); the verdict is an exact integer compare, so
    * every row hash-verifies. Bucket width 500 chars keeps the length
    * dimension coarse enough to be a plausible QI rather than a
    * fingerprint. */
  def kAnonymityReport(spark: SparkSession, sfDir: String, k: Long = 5L): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("source"),
        expr("n_chars DIV 500").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", col("n_docs") < lit(k))
      .orderBy(col("lang"), col("source"), col("len_bucket"))

  /** One named check: `value` is the violation count (or measured
    * metric) computed inside the table's fused aggregate; `ok` is the
    * pass predicate over the aggregated (value, table row count) pair,
    * evaluated in the post-aggregate projection. */
  private final case class Check(name: String, value: Column,
    ok: (Column, Column) => Column)

  private def zeroIsOk: (Column, Column) => Column = (v, _) => v === lit(0L)

  /** Null-share budget ≤ 1/denom of the table, decided by exact integer
    * cross-multiplication (no division → no IEEE boundary). */
  private def budgetOk(denom: Long): (Column, Column) => Column =
    (v, rows) => v * lit(denom) <= rows

  /** Fuse a table's checks into ONE single-row aggregate (plus the row
    * count every budget predicate divides against), then unpivot to
    * (check, value, ok) rows — the one-scan-per-table contract. */
  private def tableChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => c.value.cast("long").as(c.name)) :+
      count(lit(1)).cast("long").as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val cols = checks.map(c =>
      struct(lit(c.name).as("check"), col(c.name).as("value"),
        c.ok(col(c.name), col("__rows")).as("ok")))
    row.select(explode(array(cols: _*)).as("c"))
      .select(col("c.check"), col("c.value"), col("c.ok"))
  }

  private def countIf(pred: Column): Column = count_if(pred)

  /** Orphan-count RI check: rows of `fact` whose `factKey` has no match
    * in `dim.dimKey`. Key-projected on both sides BEFORE the anti join
    * (the shuffle carries 8 bytes/row); null fact keys are excluded —
    * null-completeness is its own check, and a null key is not a
    * dangling reference. */
  private def orphanCheck(name: String, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame = {
    val orphans = fact.select(col(factKey)).filter(col(factKey).isNotNull)
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_anti")
      .agg(count(lit(1)).cast("long").as("value"))
    orphans.select(lit(name).as("check"), col("value"),
      (col("value") === lit(0L)).as("ok"))
  }

  /** Duplicate count over a composite key: `count(*) − |distinct key
    * groups|`, computed as an aggregate OVER the grouped counts (two
    * shuffles of count partials, no window, no self-join). */
  private def compositeDupCheck(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .agg((sum(col("n")) - count(lit(1))).cast("long").as("value"))
      .select(lit(name).as("check"), col("value"),
        (col("value") === lit(0L)).as("ok"))

  /** The registered validation suite over the whole store. Emits one
    * (check, value, ok) row per contract, ordered by check name. */
  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    def t(name: String) = graft.sources.Tables.table(spark, sfDir, name)
    val customer = t("customer")
    val orders = t("orders")
    val lineitem = t("lineitem")
    val documents = t("documents")
    val embeddings = t("embeddings")
    val events = graft.sources.Tables.events(spark, sfDir)

    val perTable = Seq(
      tableChecks(customer, Seq(
        Check("customer_key_null", countIf(col("c_custkey").isNull), zeroIsOk),
        Check("customer_key_dup",
          count(lit(1)) - countDistinct(col("c_custkey")), zeroIsOk))),
      tableChecks(orders, Seq(
        Check("orders_key_null", countIf(col("o_orderkey").isNull), zeroIsOk),
        Check("orders_key_dup",
          count(lit(1)) - countDistinct(col("o_orderkey")), zeroIsOk),
        Check("orders_price_nonpos",
          countIf(col("o_totalprice") <= 0.0d), zeroIsOk),
        Check("orders_status_domain",
          countIf(!col("o_orderstatus").isin("O", "F", "P")
            || col("o_orderstatus").isNull), zeroIsOk))),
      tableChecks(lineitem, Seq(
        Check("lineitem_discount_range",
          countIf(col("l_discount") < 0.0d || col("l_discount") > 1.0d), zeroIsOk),
        Check("lineitem_qty_nonpos", countIf(col("l_quantity") <= 0.0d), zeroIsOk))),
      tableChecks(documents, Seq(
        Check("documents_id_null", countIf(col("doc_id").isNull), zeroIsOk),
        Check("documents_id_dup",
          count(lit(1)) - countDistinct(col("doc_id")), zeroIsOk),
        // null-text budget: share ≤ 5%, verdict by integer
        // cross-multiplication against the row count
        Check("documents_text_null_budget", countIf(col("text").isNull),
          budgetOk(20L)))),
      tableChecks(embeddings, Seq(
        Check("embeddings_id_dup",
          count(lit(1)) - countDistinct(col("vec_id")), zeroIsOk),
        // every present vector carries the corpus dimensionality: the
        // distinct-width count over non-null vectors must be ≤ 1 (a
        // single scan; widths are tiny ints, the distinct is cheap)
        Check("embeddings_dim_consistent",
          countDistinct(when(col("embedding").isNotNull, size(col("embedding")))),
          (v, _) => v <= lit(1L)))),
      tableChecks(events, Seq(
        Check("events_id_dup",
          count(lit(1)) - countDistinct(col("event_id")), zeroIsOk),
        Check("events_ts_null", countIf(col("ts").isNull), zeroIsOk),
        Check("events_user_null_budget", countIf(col("user_id").isNull),
          budgetOk(20L)),
        Check("events_value_null_budget", countIf(col("value").isNull),
          budgetOk(20L)))))

    val ri = Seq(
      orphanCheck("orders_custkey_ri", orders, "o_custkey", customer, "c_custkey"),
      orphanCheck("lineitem_orderkey_ri", lineitem, "l_orderkey", orders, "o_orderkey"),
      // full-row duplicate screen: this generator's lineitem carries no
      // single-column key (and even (orderkey, linenumber) collides by
      // design), so the fact-table contract is "no row appears twice" —
      // grouped over ALL columns, still a two-phase partial aggregate
      compositeDupCheck("lineitem_row_dup", lineitem, lineitem.columns.toSeq))

    (perTable ++ ri).reduce(_.unionByName(_)).orderBy("check")
  }

  /** Fixture surface: the same fused per-table machinery over caller
    * DataFrames, for planted-violation tests. */
  private[graft] def checksFor(df: DataFrame, keyCol: String, textCol: Option[String]): DataFrame = {
    val base = Seq(
      Check(s"${keyCol}_null", countIf(col(keyCol).isNull), zeroIsOk),
      Check(s"${keyCol}_dup", count(lit(1)) - countDistinct(col(keyCol)), zeroIsOk))
    val withText = textCol.fold(base)(tc => base :+
      Check(s"${tc}_null_budget", countIf(col(tc).isNull), budgetOk(20L)))
    tableChecks(df, withText).orderBy("check")
  }

  /** Right-to-be-forgotten propagation audit: a deterministic tombstone
    * cohort (custkey % 97 == 13 — the store ships no real deletion
    * feed) is cascaded through the foreign-key graph — customer →
    * orders → lineitem, plus the events keyed by the same ids — and
    * the audit reports per table how many rows the cascade removes.
    * The cascade is pure key-set algebra: each hop is a semi-join of
    * the child's keys against the PARENT'S deleted keys (broadcast —
    * the tombstone frontier is cohort-sized, never corpus-sized), and
    * the counts come from one aggregate per table; no purged copy is
    * materialized here (a real purge would anti-join-write with the
    * same predicates, which is why the audit and the purge cannot
    * disagree). Fully oracle-checkable.
    */
  def deletionAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val tomb = t("customer").filter(col("c_custkey") % 97 === 13)
      .select(col("c_custkey").as("del_key"))
    val delOrders = t("orders")
      .join(broadcast(tomb), col("o_custkey") === col("del_key"), "left_semi")
    val delOrderKeys = delOrders.select(col("o_orderkey").as("del_ok"))
    def audit(name: String, total: DataFrame, deleted: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_before"))
        .crossJoin(deleted.agg(count(lit(1)).as("n_deleted")))
        .select(lit(name).as("table_name"), col("n_before"), col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"))
    audit("customer", t("customer"),
        t("customer").join(broadcast(tomb), col("c_custkey") === col("del_key"), "left_semi"))
      .unionByName(audit("orders", t("orders"), delOrders))
      .unionByName(audit("lineitem", t("lineitem"),
        t("lineitem").join(broadcast(delOrderKeys),
          col("l_orderkey") === col("del_ok"), "left_semi")))
      .unionByName(audit("events", t("events"),
        t("events").join(broadcast(tomb), col("user_id") === col("del_key"), "left_semi")))
      .orderBy(col("table_name"))
  }

  /** Functional-dependency audit — the profiling step that tells a
    * modeler which columns actually determine which (before trusting a
    * join key or denormalizing): for each candidate FD lhs→rhs, the
    * number of lhs values, how many of them map to MORE than one rhs
    * (violations), and the worst fan-out. Each FD is one grouped
    * aggregate whose shuffle carries (lhs, rhs) pairs — distinct-value
    * scale, not row scale — then a |lhs|-sized rollup; candidates with
    * composite tables would semi-join first. The verdict column makes
    * the holding FDs a regression surface: `n_violating = 0` is as
    * hash-checkable as any literal. */
  def fdViolations(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def fd(table: String, lhs: String, rhs: String): DataFrame =
      spark.read.parquet(s"$sfDir/$table.parquet")
        .filter(col(lhs).isNotNull)
        .groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("n_rhs")).as("max_fanout"))
        .select(lit(s"$table.$lhs->$rhs").as("fd"), col("n_lhs"),
          col("n_violating"), col("max_fanout"),
          (col("n_violating") === 0L).as("holds"))
    fd("nation", "n_nationkey", "n_regionkey")              // PK-determined: holds
      .unionByName(fd("customer", "c_nationkey", "c_mktsegment")) // expected violated
      .unionByName(fd("orders", "o_orderkey", "o_orderpriority")) // PK: holds
      .unionByName(fd("lineitem", "l_orderkey", "l_shipdate"))    // multi-line: violated
      .unionByName(fd("documents", "source", "lang"))
      .orderBy(col("fd"))
  }
}
