package graft.ops

import graft.Tables
import graft.ext.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12d analyst statistics: link analysis (HITS), time-series
  * autocorrelation and Holt smoothing, ROC AUC, and a deterministic
  * Poisson bootstrap — each built on the repo's exact-arithmetic
  * discipline ([[graft.Det]]) so the DuckDB oracle replays every query
  * bit-identically, and each shaped so the fact table is touched once
  * and all ranking/recursion runs on an aggregated (dimension-sized)
  * grain.
  */
object StatOps {

  /** HITS hubs & authorities over the customer→supplier purchase
    * bipartite graph (Kleinberg 1999) — the link-analysis companion to
    * [[ExtraOps.pagerank]]: customers are hubs ("buys from many good
    * suppliers"), suppliers are authorities ("bought by many good
    * customers"). Two full unrolled mutual-reinforcement rounds
    * (a ← Σ h over in-edges, h ← Σ a over out-edges), each followed by
    * L1 normalization to a 10^12 fixed-point total.
    *
    * Cross-engine determinism: scores are integers; the only division is
    * the normalization `(10^12 · x) DIV Σx` with the product widened to
    * DECIMAL(38,0) (DuckDB: HUGEINT — its DECIMAL `//` is double
    * division, the round-12 gotcha), so Spark and DuckDB agree bit-for-
    * bit. Bounds: Σ of any pre-norm score column ≤ in/out-degree bound ×
    * 10^12 ≈ 10^16 (fits BIGINT); norm products ≤ 10^28 (fits both
    * DECIMAL(38,0) and HUGEINT).
    *
    * At 100 TB: each half-round is ONE keyed join (scores ⋈ edges, both
    * hash-partitioned on the join key) + a map-side-combined sum; the
    * normalizer is a 1-row broadcast. The edge list is loop-invariant —
    * localCheckpoint'ed once, bucketed in production — so four
    * half-rounds never rescan the fact.
    */
  def hits(s: SparkSession, d: String): DataFrame = {
    val SCALE = "1000000000000"
    val edges = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
      .distinct()
      .localCheckpoint() // loop-invariant adjacency, reused 4×
    def norm(df: DataFrame, sc: String): DataFrame =
      df.crossJoin(broadcast(df.agg(sum(col(sc)).as("tot"))))
        .withColumn(sc,
          expr(s"CAST((CAST($sc AS DECIMAL(38,0)) * $SCALE) DIV tot AS BIGINT)"))
        .drop("tot")
    val h0 = edges.select(col("c")).distinct()
      .withColumn("h", lit(1000000L))
    def authFrom(h: DataFrame): DataFrame = norm(
      edges.join(h, Seq("c"))
        .groupBy(col("sup")).agg(sum(col("h")).as("a")), "a")
    def hubFrom(a: DataFrame): DataFrame = norm(
      edges.join(a, Seq("sup"))
        .groupBy(col("c")).agg(sum(col("a")).as("h")), "h")
    // Checkpoint each round's score frame: norm() references its input
    // twice (rows + the 1-row total) and every round references the
    // previous round's frame through both, so the UNchained plan
    // re-executes round r's subtree 2^(rounds−r) times — 314 Exchanges /
    // 88 SortMergeJoins in the r17 before-plan. Scores are node-grain
    // (the same per-iteration frame a production run persists), so each
    // checkpoint is dimension-sized; the after-plan joins each round
    // exactly once.
    val a1 = authFrom(h0).localCheckpoint()
    val h1 = hubFrom(a1).localCheckpoint()
    val a2 = authFrom(h1).localCheckpoint()
    val h2 = hubFrom(a2)
    a2.select(lit("authority").as("node_type"), col("sup").as("node_id"),
        col("a").as("score"))
      .unionAll(h2.select(lit("hub").as("node_type"), col("c").as("node_id"),
        col("h").as("score")))
      .orderBy(col("node_type"), desc("score"), col("node_id"))
  }

  /** Autocorrelation (correlogram) of the daily order-revenue series at
    * lags 1, 2 and 7 — the seasonality probe behind every forecasting
    * pipeline (lag-7 high = weekly cycle; lag-1 high = momentum). Each
    * lag is the Pearson correlation of the series with its shifted self
    * over the aligned pairs.
    *
    * The [[ExtraOps.correlation]] discipline per lag: x, y are exact
    * integer cents; all five power sums are DECIMAL(38,0); the
    * cancellation-prone n·Σxy − Σx·Σy stays exact decimal and only the
    * final ratio is double — with the >2^53 operands STRING-routed
    * (exact digits → correctly-rounded strtod on both engines), the
    * DoubleSafetySpec escape hatch.
    *
    * At 100 TB: the fact is touched once (one groupBy day); the lag
    * self-join and the correlation run on the daily grain (~10^3 rows
    * per decade), so cost is calendar-sized regardless of fact volume.
    */
  def autocorr(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr(
        "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS DECIMAL(19,0))) AS BIGINT)")
        .as("y"))
    val a = daily.withColumn("lag", explode(array(lit(1), lit(2), lit(7))))
      .select(col("lag"), col("day"), col("y").as("xa"))
    val b = daily.select(col("day").as("bday"), col("y").as("xb"))
    a.join(b, expr("bday = day - lag"))
      .select(col("lag"),
        col("xa").cast("decimal(19,0)").as("x"),
        col("xb").cast("decimal(19,0)").as("y"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n_pairs"),
        (expr("CAST(CAST(n_pairs * sxy - sx * sy AS STRING) AS DOUBLE)") /
          (sqrt(expr("CAST(CAST(n_pairs * sxx - sx * sx AS STRING) AS DOUBLE)")) *
            sqrt(expr("CAST(CAST(n_pairs * syy - sy * sy AS STRING) AS DOUBLE)"))))
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** LOG-LOG PRICE ELASTICITY OF DEMAND — the econometric regression
    * (slope of lg quantity on lg unit price across parts) that ln-based
    * pipelines can never hash-verify: both logs are the EXACT fixed-
    * point binary log ([[graft.ext.FixLog]]), and because elasticity is
    * a RATIO of log-differences, the 2^16 scale and the log base cancel
    * — the slope is d log q / d log p in any base, the economist's
    * elasticity. Per part: integer unit price (revenue cents div
    * quantity, a defined metric) and total quantity; OLS moments are
    * exact BIGINT sums routed to double through DECIMAL(38)/HUGEINT
    * string casts (the wide-decimal discipline), one division each.
    *
    * At 100 TB: one map-side-combined fold to part grain, one fold to
    * the moment row — the classic two-pass-free regression shape; no
    * window, no data-grain shuffle beyond the part aggregation.
    */
  def elasticity(s: SparkSession, d: String): DataFrame = {
    import graft.ext.FixLog.lgS
    val parts = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"),
        sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .as("rev_cents"))
      .filter(col("q") >= 1 && col("rev_cents") >= col("q"))
      .select(expr("rev_cents div q").as("p_cents"), col("q"))
      .select(expr(lgS("p_cents")).as("x"), expr(lgS("q")).as("y"))
    val dec = "DECIMAL(38,0)"
    parts.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("n"), col("sx"), col("sy"),
        (expr(s"CAST(CAST(CAST(n AS $dec) * CAST(sxy AS $dec) - " +
          s"CAST(sx AS $dec) * CAST(sy AS $dec) AS STRING) AS DOUBLE)") /
          expr(s"CAST(CAST(CAST(n AS $dec) * CAST(sxx AS $dec) - " +
            s"CAST(sx AS $dec) * CAST(sx AS $dec) AS STRING) AS DOUBLE)"))
          .as("elasticity"))
      .select(col("n").as("n_parts"), col("elasticity"),
        ((col("sy").cast("double") - col("elasticity") * col("sx").cast("double"))
          / col("n").cast("double") / lit(65536.0)).as("intercept_bits"))
  }

  /** Exact ROC AUC of "total price predicts urgency" — the
    * classifier-evaluation primitive (ranking quality of a score against
    * a binary label), computed by the rank identity
    * AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) rather than a
    * thresholds sweep. Labels: priority ∈ {1-URGENT, 2-HIGH}.
    *
    * The [[ExtraOps.mannWhitney]] shape (AUC = U/(n₁n₀) is the same
    * statistic): rows collapse to DISTINCT score values carrying
    * (n_pos, n_neg) counts, a running sum over that value grain counts
    * negatives strictly below each value, and ties contribute in exact
    * half-units by doubling: num2 = Σᵥ n₁(v)·(2·cum₀(<v) + n₀(v)), so
    * AUC = num2 / (2·N₁·N₀) is ONE division of sub-2^53 BIGINTs —
    * bit-identical cross-engine (int64→float64 is exempt from the
    * string-routing rule). Gini = 2·AUC − 1 from the same double.
    *
    * At 100 TB: the fact collapses to distinct score values in one
    * map-side-combined pass; only the value grain is sorted (the ROC
    * curve's own grain — you cannot rank coarser without changing the
    * statistic). That value grain rides ONE unpartitioned window: exact
    * by necessity, priced by the score cardinality. When the distinct
    * grain itself outgrows a partition (billions of distinct floats),
    * switch to [[aucBucketed]] — the same rank identity on a fixed score
    * grid, error bounded by the reported tie half-width.
    */
  def auc(s: SparkSession, d: String): DataFrame = {
    val v = Tables.orders(s, d)
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("score"),
        expr("CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT)").as("pos"))
      .groupBy(col("score"))
      .agg(sum(col("pos")).as("n1"), sum(expr("1 - pos")).as("n0"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    v.withColumn("cum0", coalesce(sum(col("n0")).over(w), lit(0L)))
      .agg(sum(col("n1")).as("n_pos"), sum(col("n0")).as("n_neg"),
        sum(expr("n1 * (2 * cum0 + n0)")).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        (col("num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
      .withColumn("auc_gini", lit(2.0) * col("auc") - lit(1.0))
  }

  /** BUCKETED ROC AUC — [[auc]]'s scale path (the a7 exact/approx
    * pattern): scores collapse onto a fixed-width grid (cent-scores div
    * 2^16 ≈ $655 buckets) and the SAME rank identity runs at bucket
    * grain, which is exactly the trapezoid rule on the bucketed ROC
    * curve — within-bucket pairs get half credit, i.e. the straight-line
    * segment between curve points. The window therefore ranks a
    * bounded-cardinality grid (the grid is chosen, not data-driven) no
    * matter how many distinct scores the fact carries; everything else
    * is one map-side-combined scan. `tie_halfwidth` is the EXACT error
    * bound: true AUC ∈ bucketed ± tie_halfwidth, because each
    * within-bucket pair contributes between 0 and 1 against the ½
    * assumed. Use [[auc]] while distinct scores fit a partition (it is
    * exact); switch here when the value grain itself is the bottleneck —
    * at any grid a machine can hold, the bound reported tells you
    * whether the resolution suffices.
    *
    * Integer-exact: all sums are BIGINT, the two divisions are single
    * int64→float64-exempt casts — bit-identical cross-engine, so unlike
    * a sketch this approximation hash-verifies.
    */
  def aucBucketed(s: SparkSession, d: String): DataFrame = {
    val v = Tables.orders(s, d)
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) div 65536")
        .as("bucket"),
        expr("CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT)").as("pos"))
      .groupBy(col("bucket"))
      .agg(sum(col("pos")).as("n1"), sum(expr("1 - pos")).as("n0"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    v.withColumn("cum0", coalesce(sum(col("n0")).over(w), lit(0L)))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n1")).as("n_pos"), sum(col("n0")).as("n_neg"),
        sum(expr("n1 * (2 * cum0 + n0)")).as("num2"),
        sum(expr("n1 * n0")).as("tie2"))
      .select(col("n_buckets"), col("n_pos"), col("n_neg"),
        (col("num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc_bucketed"),
        (col("tie2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("tie_halfwidth"))
  }

  /** PAGE-HINKLEY DRIFT DETECTION on the daily revenue series — the
    * sequential change detector the streaming-drift literature ships
    * (Gama et al.): PH_t = m_t − min_{s≤t} m_s where m_t accumulates
    * deviations from the global mean beyond a slack δ; an alarm fires
    * when the statistic clears λ. Everything is INTEGER: deviations are
    * scaled by n (x_i·n − Σx − δ·n avoids the mean division), both the
    * running sum and its prefix minimum are windows over the bounded
    * calendar grain, and the alarm threshold compares scaled BIGINTs —
    * so the alarm DAYS are engine-identical, which is the point of a
    * drift gate. δ = 2% and λ = 40% of mean daily revenue (both exact
    * integer multiples of Σx).
    *
    * vs [[graft.ops.QcOps.controlChart]]: Shewhart flags single
    * outlier days; Page-Hinkley accumulates small sustained shifts —
    * the two alarms catch disjoint failure modes.
    */
  def pageHinkley(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
        .as("x"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val wRun = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(tot))
      // dev = (x - mean - delta)·50n in integers: 50·(x·n − sx) − sx·n/mean…
      // concretely δ = 0.02·mean ⇒ dev·50n = 50·n·x − 50·sx − sx
      .withColumn("dev", expr("50 * n * x - 51 * sx"))
      .withColumn("m", sum(col("dev")).over(wRun))
      .withColumn("m_min", min(col("m")).over(wRun))
      .withColumn("ph", col("m") - col("m_min"))
      // λ = 0.40·mean ⇒ compare ph against 0.40·(sx/n)·50n = 20·sx
      .withColumn("alarm", col("ph") > expr("20 * sx"))
      .select(col("day"), col("x").as("rev_cents"), col("ph"),
        col("alarm"))
      .orderBy(col("day"))
  }

  /** CROSTON'S METHOD for INTERMITTENT demand — the forecasting family
    * [[holt]]'s smoothing cannot serve: when most days have ZERO demand
    * (spare parts, long-tail SKUs), smoothing the raw series drives the
    * level toward zero and spikes on every order; Croston instead
    * smooths TWO series — demand SIZE and INTER-ARRIVAL interval — only
    * on demand days, and forecasts their ratio. Both EWMAs are exact
    * integer folds (α = 1/8: s' = s + (x − s) div 8, truncating division
    * identical in both engines, including toward-zero on negatives), so
    * the full trace hash-verifies: Spark folds the bounded demand-event
    * array with aggregate(); DuckDB replays it as a RECURSIVE CTE (its
    * list_reduce cannot carry struct state — the established split).
    * `rate_ppm` = size/interval in exact ppm is the demand-per-day
    * forecast after each event.
    *
    * At 100 TB: the fact folds map-side to demand-day grain for the one
    * rare-part family; the fold runs on the bounded event array — the
    * calendar prices the operator, not the order volume.
    */
  def croston(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dem = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 997 === 0)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
    val w = Window.orderBy(col("day"))
    val ev = dem
      .withColumn("gap", coalesce(
        datediff(col("day"), lag(col("day"), 1).over(w)), lit(1))
        .cast("long"))
    val arr = ev.agg(sort_array(
      collect_list(struct(col("day"), col("gap"), col("q")))).as("a"))
    arr
      .withColumn("tr", expr(
        """aggregate(a, CAST(array() AS ARRAY<STRUCT<z: BIGINT, p: BIGINT>>),
          |  (acc, x) -> CASE WHEN size(acc) = 0
          |    THEN array(named_struct('z', x.q, 'p', x.gap))
          |    ELSE concat(acc, array(named_struct(
          |      'z', element_at(acc, -1).z + (x.q - element_at(acc, -1).z) div 8,
          |      'p', element_at(acc, -1).p + (x.gap - element_at(acc, -1).p) div 8)))
          |  END)""".stripMargin))
      .withColumn("t", explode(expr("sequence(1, size(a))")))
      .select(expr("element_at(a, t).day").as("day"),
        expr("element_at(a, t).q").as("demand"),
        expr("element_at(a, t).gap").as("gap_days"),
        expr("element_at(tr, t).z").as("z_size"),
        expr("element_at(tr, t).p").as("p_interval"),
        expr("(element_at(tr, t).z * 1000000) div " +
          "greatest(1L, element_at(tr, t).p)").as("rate_ppm"))
      .orderBy(col("day"))
  }

  /** MUTUAL INFORMATION between the corpus' lang and source labels, in
    * exact bits — the feature-dependence measure (is source a proxy for
    * language? does stratifying by one balance the other?) that, like
    * KL, was closed to hash verification until [[graft.ext.FixLog]]:
    * H(X) = lg(N) − (Σ nₓ·lg nₓ) div N over truncated fixed-point logs
    * for each marginal and the joint, then I = H(lang) + H(source) −
    * H(joint) — every term the same well-defined integer in both
    * engines (truncation can leave I a few µbits below zero under
    * independence; the sign convention is part of the metric's
    * definition, not noise).
    *
    * At 100 TB: three map-side-combined counts at label grain; the log
    * runs on ≤ |langs|·|sources| rows.
    */
  def mutualInfo(s: SparkSession, d: String): DataFrame = {
    import graft.ext.FixLog.lgS
    val docs = Tables.documents(s, d)
    def ent(df: DataFrame, n: String): DataFrame =
      df.crossJoin(broadcast(docs.agg(count(lit(1)).as("nn"))))
        .agg(max(col("nn")).as("nn"),
          sum(expr(s"c * ${lgS("c")}")).as("slg"))
        .select(expr(s"${lgS("nn")} - (slg div nn)").as(n))
    val hl = ent(docs.groupBy(col("lang")).agg(count(lit(1)).as("c")), "h_lang_fp")
    val hs = ent(docs.groupBy(col("source")).agg(count(lit(1)).as("c")), "h_source_fp")
    val hj = ent(docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c")), "h_joint_fp")
    docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(hl)).crossJoin(broadcast(hs)).crossJoin(broadcast(hj))
      .withColumn("mi_fp",
        col("h_lang_fp") + col("h_source_fp") - col("h_joint_fp"))
      .withColumn("mi_bits", col("mi_fp").cast("double") / lit(65536.0))
  }

  /** MULTINOMIAL NAIVE BAYES language classifier, trained and scored in
    * exact FixLog bits — the CCNet/fastText-style classifier gate every
    * pretraining pipeline runs (quality/language filtering), made
    * hash-verifiable: train on doc_id % 5 ≠ 0, score the held-out fifth,
    * emit the confusion matrix. Laplace-smoothed log-likelihoods are
    * DEFINED over the truncated fixed-point log2
    * ([[graft.ext.FixLog]]): score(L | doc) = lg(docs_L) − lg(N) −
    * m·lg(tokens_L + V) + Σ_w lg(c(w,L)+1), all BIGINT, so both engines
    * compute the identical integer and pick the identical argmax (ties
    * break on label order — deterministic).
    *
    * Honest read of the output: this synthetic corpus draws every
    * language's text from the SAME vocabulary, so the label carries no
    * lexical signal and a correct NB collapses to the class prior — the
    * confusion matrix shows exactly that majority-class behavior
    * (accuracy = base rate 0.42). What the gate verifies is the
    * estimator itself: smoothed counts, log-priors, per-token
    * likelihoods, and argmax agree bit-for-bit across engines, which is
    * the property that matters when this classifier gates real data.
    *
    * At 100 TB: training is one token-grain map-side-combined count
    * (the word-type attribute domain, Heaps-sublinear); scoring joins
    * test tokens to the count table keyed by word — the same
    * broadcast-or-shuffle-by-key shape as the tokenizer encoders. The
    * per-label cross is ×|labels| (constant 5), never ×vocab.
    */
  def naiveBayes(s: SparkSession, d: String): DataFrame = {
    import graft.ext.FixLog.lgS
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
    val trainTok = train
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val counts = trainTok.groupBy(col("lang").as("lang_cand"), col("w"))
      .agg(count(lit(1)).as("cw"))
    val cand = trainTok.groupBy(col("lang").as("lang_cand"))
      .agg(count(lit(1)).as("toks"))
      .join(train.groupBy(col("lang").as("lang_cand"))
        .agg(count(lit(1)).as("nd")), "lang_cand")
      .crossJoin(broadcast(trainTok.agg(
        countDistinct(col("w")).as("v"))))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("n"))))
    val testTok = test
      .select(col("doc_id"), col("lang").as("lang_true"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // The 16-step FixLog fold runs per (word TYPE, label) on the count
    // table and per label on the 5-row candidate frame — never per
    // scored token: an unseen (w, label) contributes lg(0+1) = 0
    // exactly, so the sparse per-label sum plus a zero-fill is the
    // identical integer the per-token form computed (r16 perf pass;
    // same oracle).
    val termVec = counts.withColumn("term", expr(lgS("cw + 1")))
      .select(col("lang_cand"), col("w"), col("term"))
    val candLg = cand
      .withColumn("lg_nd", expr(lgS("nd")))
      .withColumn("lg_n", expr(lgS("n")))
      .withColumn("lg_tv", expr(lgS("toks + v")))
      .select(col("lang_cand"), col("lg_nd"), col("lg_n"), col("lg_tv"))
    val docM = testTok.groupBy(col("doc_id"), col("lang_true"))
      .agg(count(lit(1)).as("m"))
    val sparse = testTok.join(termVec, Seq("w"))
      .groupBy(col("doc_id"), col("lang_cand"))
      .agg(sum(col("term")).as("sumlg"))
    docM.crossJoin(broadcast(candLg))
      .join(sparse, Seq("doc_id", "lang_cand"), "left")
      .withColumn("score", expr(
        "lg_nd - lg_n - m * lg_tv + coalesce(sumlg, CAST(0 AS BIGINT))"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("lang_cand"))))
      .filter(col("rk") === 1)
      .groupBy(col("lang_true"), col("lang_cand").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang_true"), col("lang_pred"))
  }

  /** DECISION STUMP by exact error count — the weak learner boosting
    * stacks and the simplest trainable model that hash-verifies: over
    * the bucketed price grid ([[aucBucketed]]'s 2^16-cent buckets), find
    * the threshold and side minimizing MISCLASSIFICATIONS of the
    * urgency label. Error counts are prefix sums of integer bucket
    * tallies; the argmin tie-breaks on the threshold — no impurity
    * fractions, no floats, so both engines pick the identical split.
    * Reported against the majority-class baseline: a stump that can't
    * beat base rate is the canonical "no signal" gate.
    */
  def decisionStump(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.orders(s, d)
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) div 65536")
        .as("b"),
        expr("CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT)").as("pos"))
      .groupBy(col("b"))
      .agg(sum(col("pos")).as("n1"), sum(expr("1 - pos")).as("n0"))
    val tot = g.agg(sum(col("n1")).as("tp"), sum(col("n0")).as("tq"),
      count(lit(1)).as("n_buckets"))
    val w = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)
    val scored = g.crossJoin(broadcast(tot))
      .withColumn("p1", sum(col("n1")).over(w))
      .withColumn("p0", sum(col("n0")).over(w))
      .withColumn("err_le", col("p0") + col("tp") - col("p1"))
      .withColumn("err_gt", col("p1") + col("tq") - col("p0"))
      .withColumn("err", least(col("err_le"), col("err_gt")))
      .withColumn("side",
        when(col("err_le") <= col("err_gt"), lit("pos_if_le"))
          .otherwise(lit("pos_if_gt")))
    scored
      .orderBy(col("err"), col("b"))
      .limit(1)
      .select(col("b").as("threshold_bucket"), col("side"),
        col("err").as("errors"), expr("least(tp, tq)").as("base_errors"),
        col("n_buckets"),
        expr("((tp + tq - err) * 1000000) div (tp + tq)").as("accuracy_ppm"))
  }

  /** BOOSTING BY MAJORITY with multiplicative weights — the ensemble
    * extension of [[decisionStump]], in the integer-exact variant
    * (misclassified weights DOUBLE each round — Littlestone-style ×2,
    * no AdaBoost exponentials): three rounds, each fitting the
    * weighted-error-optimal stump on the current weights, then a
    * majority vote. Weights, errors, prefix sums, and votes are all
    * BIGINT; weights start at the bucket counts and at most ×8 after
    * three rounds (≪ 2^53), so both engines replay the identical
    * training trajectory. Output: per round, the chosen stump, its
    * weighted error, and the ensemble's EXACT training-error count
    * after that round's vote joins (majority of r votes, ties → the
    * negative class — a defined rule, not an accident).
    *
    * The target is the INTERVAL concept (positive ⇔ mid-price band,
    * buckets 229..457) — the canonical label NO single threshold stump
    * can express (every round's weighted error stays ≥ the minority
    * mass) but a majority of edge stumps CAN: round 1 falls back to
    * the majority class, the doubled positives pull round 2 to the
    * upper edge and round 3 to the lower, and the three votes land the
    * ensemble's training error at EXACTLY ZERO — boosting visibly
    * beating every weak learner it is built from, all in integers
    * (OperatorSpec pins the zero and the per-stump floor).
    *
    * The three stump params collected to the driver are 9 scalars — the
    * bounded-artifact discipline (model parameters, not data).
    *
    * At 100 TB: each round is one pass over the BOUNDED bucket grid
    * (the corpus collapsed to per-bucket counts once, map-side); the
    * sequential dependency is across 3 rounds, not across rows.
    */
  def boostMajority(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.orders(s, d)
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) div 65536")
        .as("b"))
      .select(col("b"),
        expr("CAST(b BETWEEN 229 AND 457 AS BIGINT)").as("pos"))
      .groupBy(col("b"))
      .agg(sum(col("pos")).as("n1"), sum(expr("1 - pos")).as("n0"))
      .localCheckpoint()
    val cum = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)
    def bestStump(w: DataFrame): (Long, String, Long) = {
      val t = w.agg(sum(col("w1")).as("tp"), sum(col("w0")).as("tq"))
      val row = w.crossJoin(broadcast(t))
        .withColumn("p1", sum(col("w1")).over(cum))
        .withColumn("p0", sum(col("w0")).over(cum))
        .withColumn("err_le", col("p0") + col("tp") - col("p1"))
        .withColumn("err_gt", col("p1") + col("tq") - col("p0"))
        .withColumn("err", least(col("err_le"), col("err_gt")))
        .withColumn("side",
          when(col("err_le") <= col("err_gt"), lit("pos_if_le"))
            .otherwise(lit("pos_if_gt")))
        .orderBy(col("err"), col("b")).limit(1)
        .select(col("b"), col("side"), col("err")).collect()(0)
      (row.getLong(0), row.getString(1), row.getLong(2))
    }
    var w = g.select(col("b"), col("n1").as("w1"), col("n0").as("w0"))
    val stumps = collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    for (_ <- 1 to 3) {
      val st = bestStump(w)
      stumps += st
      val predPos =
        if (st._2 == "pos_if_le") col("b") <= lit(st._1)
        else col("b") > lit(st._1)
      w = w.select(col("b"),
        when(predPos, col("w1")).otherwise(col("w1") * 2L).as("w1"),
        when(predPos, col("w0") * 2L).otherwise(col("w0")).as("w0"))
        .localCheckpoint()
    }
    // ensemble training error after each round: majority of the first r
    // votes (+1 pos / −1 neg per stump), ties to the negative class
    def voteCol(st: (Long, String, Long)) =
      when(if (st._2 == "pos_if_le") col("b") <= lit(st._1)
           else col("b") > lit(st._1), lit(1L)).otherwise(lit(-1L))
    val rows = (1 to 3).map { r =>
      val votes = stumps.take(r).map(voteCol).reduce(_ + _)
      val err = g.select(
        sum(when(votes > 0, col("n0")).otherwise(col("n1"))).as("e"))
        .collect()(0).getLong(0)
      (r.toLong, stumps(r - 1)._1, stumps(r - 1)._2, stumps(r - 1)._3, err)
    }
    s.createDataFrame(rows).toDF(
      "round", "threshold_bucket", "side", "weighted_err", "ensemble_err")
      .orderBy(col("round"))
  }

  /** OFFLINE BANDIT POLICY EVALUATION by the replay method (Li et al.,
    * WSDM'11) — the counterfactual evaluator every recommendation /
    * data-selection loop needs before deploying a policy: replay the
    * logged stream in event-time order; whenever the candidate policy's
    * choice equals the LOGGED arm, the event counts as a pull and its
    * reward feeds the policy's state, otherwise it is skipped
    * (unbiased under uniform logging — and this log is a uniform
    * event_id % 11 sample). The policy is Laplace-smoothed greedy:
    * argmax (rewards+1)/(pulls+2), ties to the smaller arm index —
    * fraction compares are BIGINT cross-multiplications, rewards are
    * integer threshold indicators, so the whole trajectory is exact
    * and the oracle replays it as one recursive CTE.
    *
    * At 100 TB: replay is inherently SEQUENTIAL over the logged
    * stream — that is the estimator's definition, not an
    * implementation accident — so production evaluates on a uniform
    * sample (exactly what the % 11 gate is) or shards by user segment
    * into independent replays. The fold is one pass; state is 10
    * integers.
    */
  def banditReplay(s: SparkSession, d: String): DataFrame = {
    val log = Tables.events(s, d).filter(col("event_id") % 11 === 0)
      .select(expr("unix_micros(ts)").as("t"), col("event_id"),
        expr("""CASE event_type WHEN 'click' THEN 0L WHEN 'error' THEN 1L
            |  WHEN 'purchase' THEN 2L WHEN 'signup' THEN 3L ELSE 4L END"""
          .stripMargin).as("arm"),
        expr("CAST(value > 50.0D AS BIGINT)").as("rw"))
    val folded = log
      .agg(sort_array(collect_list(struct(col("t"), col("event_id"),
        col("arm"), col("rw")))).as("lg"))
      .withColumn("st", expr(
        """aggregate(lg,
          |  transform(sequence(0, 9), j -> CAST(0 AS BIGINT)),
          |  (acc, e) -> CASE WHEN aggregate(sequence(0, 4), CAST(0 AS BIGINT), (b, i) ->
          |      CASE WHEN (element_at(acc, CAST(i + 6 AS INT)) + 1L) *
          |                (element_at(acc, CAST(b + 1 AS INT)) + 2L) >
          |                (element_at(acc, CAST(b + 6 AS INT)) + 1L) *
          |                (element_at(acc, CAST(i + 1 AS INT)) + 2L)
          |           THEN i ELSE b END) = e.arm
          |    THEN transform(sequence(0, 9), j ->
          |      CASE WHEN j = e.arm THEN element_at(acc, CAST(j + 1 AS INT)) + 1L
          |           WHEN j = e.arm + 5 THEN element_at(acc, CAST(j + 1 AS INT)) + e.rw
          |           ELSE element_at(acc, CAST(j + 1 AS INT)) END)
          |    ELSE acc END)""".stripMargin))
    val arms = s.createDataFrame(Seq((0L, "click"), (1L, "error"),
      (2L, "purchase"), (3L, "signup"), (4L, "view"))).toDF("arm", "arm_name")
    arms.crossJoin(broadcast(folded.select(col("st"))))
      .select(col("arm_name"),
        expr("element_at(st, CAST(arm + 1 AS INT))").as("pulls"),
        expr("element_at(st, CAST(arm + 6 AS INT))").as("rewards"))
      .withColumn("reward_ppm", expr(
        "CASE WHEN pulls > 0 THEN (rewards * 1000000) div pulls ELSE 0L END"))
      .orderBy(col("arm_name"))
  }

  /** ISOTONIC REGRESSION (probability calibration) by the exact minimax
    * form — the calibrator every scored-data pipeline runs between a
    * classifier and a threshold (Platt's rival; sklearn's
    * IsotonicRegression): fit the least-squares NON-DECREASING curve of
    * P(urgent | price bucket) over [[aucBucketed]]'s 2^16-cent grid.
    * Instead of the sequential pool-adjacent-violators stack (a
    * while-merge no SQL lambda can express), the fit uses PAVA's minimax
    * characterization iso(i) = max_{j≤i} min_{k≥i} mean(j..k): prefix
    * sums make every interval mean one subtraction, the suffix-min per
    * start point is a window, the max per end point an aggregation. All
    * means divide exact BIGINT prefix differences (≪ 2^53), so both
    * engines produce bit-identical doubles and the SAME fit.
    *
    * At 100 TB: the O(grid²) pair join is over the BOUNDED bucket grid
    * (≤ ~800 rows here, fixed by the price domain — never
    * data-proportional); the corpus contributes one map-side-combined
    * count per bucket. The grid is the state, facts stream through.
    */
  def isotonic(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.orders(s, d)
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) div 65536")
        .as("b"),
        expr("CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS BIGINT)").as("pos"))
      .groupBy(col("b"))
      .agg(sum(col("pos")).as("n1"), count(lit(1)).as("n"))
    val cum = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, 0)
    val pr = g.withColumn("cp", sum(col("n1")).over(cum))
      .withColumn("cc", sum(col("n")).over(cum))
    val j = pr.select(col("b").as("jb"), col("n1").as("jn1"), col("n").as("jn"),
      col("cp").as("jcp"), col("cc").as("jcc"))
    val k = pr.select(col("b").as("kb"), col("cp").as("kcp"), col("cc").as("kcc"))
    val pairs = j.join(k, col("jb") <= col("kb"))
      .withColumn("mean", expr(
        "CAST(kcp - (jcp - jn1) AS DOUBLE) / CAST(kcc - (jcc - jn) AS DOUBLE)"))
    // suffix min over k within each start j, then max over starts per end
    val sufMin = Window.partitionBy(col("jb")).orderBy(col("kb").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    pairs.withColumn("mj", min(col("mean")).over(sufMin))
      .groupBy(col("kb").as("b"))
      .agg(max(col("mj")).as("iso_fit"))
      .join(g, "b")
      .select(col("b"), col("n"), col("n1"),
        expr("(n1 * 1000000) div n").as("raw_rate_ppm"), col("iso_fit"))
      .orderBy(col("b"))
  }

  /** DETERMINISTIC WEIGHTED RESERVOIR SAMPLE (Efraimidis–Spirakis A-Res,
    * 2006): each document draws priority u^(1/w) — here ordered by the
    * equivalent log key lg(u)/w — and the sample IS the top-k priorities.
    * The training-data use: draw a fixed-size quality-weighted sample
    * (w = word count, so substantive documents over-represent) that is
    * REPRODUCIBLE across runs, engines, and cluster layouts, with any
    * document's inclusion auditable — the same no-rand() discipline as
    * the split/mix gates, pointed at sampling without replacement.
    *
    * Exactness: u is the md5 hash gate (1..10⁶); lg(u) − lg(10⁶) is the
    * exact fixed-point [[graft.ext.FixLog]] log2 (both engines compute
    * the identical BIGINT), and the priority is ONE int64→float64-safe
    * division of that integer by the integer weight — a single correctly
    * rounded IEEE op, identical cross-engine, tie-broken on doc_id. The
    * fixed-point truncation perturbs each priority < 2⁻¹⁶ in the
    * exponent — a deterministic, documented quantization of the A-Res
    * key, not a different sampler.
    *
    * At 100 TB: top-k by priority plans as TakeOrderedAndProject — one
    * scan, per-partition heaps, k rows to the driver, NO shuffle of the
    * corpus. That plan shape is the entire point of A-Res: a weighted
    * sample without replacement that never materializes or sorts the
    * population.
    */
  def reservoir(s: SparkSession, d: String): DataFrame = {
    import graft.ext.FixLog.lgS
    val u = s"(${Hashing.sparkHash("CAST(doc_id AS STRING)")} % 1000000 + 1)"
    Tables.documents(s, d)
      .withColumn("w",
        expr("size(filter(split(text, ' '), x -> length(x) > 0))")
          .cast("long"))
      .filter(col("w") >= 1)
      .withColumn("u", expr(s"CAST($u AS BIGINT)"))
      .withColumn("prio", expr(
        s"CAST(${lgS("u")} - ${lgS("1000000")} AS DOUBLE) / CAST(w AS DOUBLE)"))
      .orderBy(desc("prio"), col("doc_id"))
      .limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("prio"), col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("source"), col("w"),
        col("u"), col("prio"))
      .orderBy(col("rank"))
  }

  /** Deterministic Poisson bootstrap CI for the mean order value — the
    * scale-out bootstrap (Chamandy et al., Google 2012): instead of
    * drawing n rows with replacement (which needs global coordination),
    * each row enters replicate b with weight ~ Poisson(1), approximated
    * by inverse-CDF over a deterministic per-(key, b) uniform — fully
    * deterministic, embarrassingly parallel, and replayable by the
    * oracle ([[graft.ext.Hashing]]).
    *
    * The uniform is COUNTER-BASED, not hash-per-pair: ONE md5 of the
    * orderkey yields two independent 60-bit slices (a, c); replicate b
    * then draws u_b = (a·(b+1) + c) mod 999983 — the Carter–Wegman
    * affine family over the largest prime < 10⁶, pairwise-independent
    * across replicates, all integer ops bounded ≪ 2⁶³ (ANSI-safe in
    * both engines). The earlier form hashed md5(b:key) per (replicate,
    * row) — 40 md5s/row; this is 1 md5 + 40 integer mixes, and the md5
    * runs BEFORE the ×B explode so the exploded rows carry only two
    * longs. Weights compare u_b against ⌊10⁶·CDF_Poisson(1)(k)⌋; the
    * modulus being 999983 rather than 10⁶ shifts each weight's
    * probability by a factor 1.000017 — noise at bootstrap precision.
    *
    * Exactness: per-replicate Σw·x and Σw are BIGINT (cents × weight ≤
    * 6, n ≤ 10^6 at bench scale → ≪ 2^53); each replicate mean is ONE
    * division of identical BIGINTs, so the 40 doubles are bit-identical
    * cross-engine and their ORDER is too — the 2.5%/97.5% ranks (2 and
    * 39 of B=40) pick the same replicates on both sides.
    *
    * At 100 TB: one scan of the fact exploded ×B with map-side combine
    * into B partial sums — no resampled copy of the data ever
    * materializes, and the ranking runs on a B-row frame.
    */
  def bootstrapCi(s: SparkSession, d: String): DataFrame = {
    val a = Hashing.sparkHashSlice("CAST(o_orderkey AS STRING)", 1, 15)
    val c = Hashing.sparkHashSlice("CAST(o_orderkey AS STRING)", 16, 15)
    val reps = Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("x"),
        expr(s"$a % 999983").as("ha"), expr(s"$c % 999983").as("hc"))
      .withColumn("b", explode(expr("sequence(0, 39)")))
      .withColumn("u", expr("(ha * (b + 1) + hc) % 999983"))
      .withColumn("w", expr(
        """CASE WHEN u < 367879 THEN 0
          |     WHEN u < 735758 THEN 1
          |     WHEN u < 919698 THEN 2
          |     WHEN u < 981011 THEN 3
          |     WHEN u < 996340 THEN 4
          |     WHEN u < 999405 THEN 5
          |     ELSE 6 END""".stripMargin))
      .groupBy(col("b"))
      .agg(sum(expr("w * x")).as("swx"), sum(col("w")).as("sw"))
      .withColumn("mean_b", col("swx").cast("double") / col("sw"))
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("mean_b"), col("b"))))
    val ci = ranked.agg(
      min(when(col("rn") === 2, col("mean_b"))).as("ci_lo"),
      max(when(col("rn") === 39, col("mean_b"))).as("ci_hi"),
      count(lit(1)).as("b_reps"))
    Tables.orders(s, d)
      .agg(count(lit(1)).as("n_orders"),
        (expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT))")
          .cast("double") / count(lit(1))).as("point_mean"))
      .crossJoin(broadcast(ci))
      .select(col("n_orders"), col("point_mean"), col("ci_lo"), col("ci_hi"),
        col("b_reps"))
  }

  /** Holt's linear-trend exponential smoothing of the monthly revenue
    * series (α = β = ¼) — the two-state upgrade of [[ExtraOps.ewma]]:
    * level ℓₜ = (yₜ + 3(ℓₜ₋₁ + bₜ₋₁)) DIV 4,
    * trend bₜ = ((ℓₜ − ℓₜ₋₁) + 3bₜ₋₁) DIV 4, seeded ℓ₀ = y₀, b₀ = 0.
    * All state is integer cents and both engines truncate DIV toward
    * zero (verified for negative trends), so the whole recursion — not
    * just its endpoint — is bit-exact cross-engine.
    *
    * The recursion is inherently sequential, so it runs where sequential
    * work belongs: on the AGGREGATED series. The fact collapses to
    * per-month cents in one distributed pass; the ~decade-of-months
    * array then folds through ONE `aggregate` higher-order function
    * (no driver loop, no per-month task), and the fitted series
    * re-explodes for output. The oracle replays it as a recursive CTE
    * over the row-numbered months — two independent spellings of the
    * same recurrence agreeing bit-for-bit is the verification.
    *
    * At 100 TB this shape is unchanged: series length is calendar-bound
    * (~120 rows/decade), never data-bound.
    */
  def holt(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .groupBy(trunc(to_date(col("o_orderdate")), "MM").as("month"))
      .agg(expr(
        "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS DECIMAL(19,0))) AS BIGINT)")
        .as("y"))
      .agg(array_sort(collect_list(struct(col("month"), col("y")))).as("series"))
      .select(explode(expr(
        """aggregate(
          |  series,
          |  named_struct(
          |    'init', false, 'lvl', CAST(0 AS BIGINT), 'trd', CAST(0 AS BIGINT),
          |    'out', CAST(array() AS
          |      ARRAY<STRUCT<month: DATE, y: BIGINT, lvl: BIGINT, trd: BIGINT>>)),
          |  (acc, p) -> CASE WHEN NOT acc.init THEN named_struct(
          |      'init', true, 'lvl', p.y, 'trd', CAST(0 AS BIGINT),
          |      'out', array(named_struct('month', p.month, 'y', p.y,
          |                                'lvl', p.y, 'trd', CAST(0 AS BIGINT))))
          |    ELSE named_struct(
          |      'init', true,
          |      'lvl', (p.y + 3 * (acc.lvl + acc.trd)) DIV 4,
          |      'trd', (((p.y + 3 * (acc.lvl + acc.trd)) DIV 4 - acc.lvl)
          |              + 3 * acc.trd) DIV 4,
          |      'out', array_append(acc.out, named_struct(
          |        'month', p.month, 'y', p.y,
          |        'lvl', (p.y + 3 * (acc.lvl + acc.trd)) DIV 4,
          |        'trd', (((p.y + 3 * (acc.lvl + acc.trd)) DIV 4 - acc.lvl)
          |                + 3 * acc.trd) DIV 4)))
          |    END,
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.month").as("month"), col("r.y").as("rev_cents"),
        col("r.lvl").as("level_cents"), col("r.trd").as("trend_cents"))
      .orderBy(col("month"))
  }

  /** Case-insensitive grouping via Spark 4 COLLATION (`collate(expr,
    * 'UTF8_LCASE')`) — the engine-native answer to mixed-case source
    * data that every ingestion pipeline otherwise solves with lower()
    * scattered through business logic. Three case variants of the
    * market segment (UPPER, lower, Title-ish) are derived
    * deterministically from the customer key, grouped under the LCASE
    * collation, and the group key is surfaced through lower() so the
    * output does not depend on which variant the engine picks as
    * representative. `n_variants` (binary-distinct forms inside each
    * collated group) pins that the collation actually merged distinct
    * binaries — 3 for every segment, or the demo proves nothing.
    * Oracle: GROUP BY lower(seg), the pre-collation idiom.
    */
  def collation(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(expr(
        """CASE CAST(c_custkey % 3 AS INT)
          |  WHEN 0 THEN upper(c_mktsegment)
          |  WHEN 1 THEN lower(c_mktsegment)
          |  ELSE concat(substring(c_mktsegment, 1, 1),
          |              lower(substring(c_mktsegment, 2)))
          |END""".stripMargin).as("seg"))
      .groupBy(expr("collate(seg, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(expr("CAST(seg AS STRING COLLATE UTF8_BINARY)"))
          .as("n_variants"))
      .select(expr("CAST(lower(k) AS STRING)").as("seg_lc"),
        col("n_rows"), col("n_variants"))
      .orderBy(col("seg_lc"))

  /** WELCH'S t-TEST (unequal variances) + Cohen's d, bit-exact
    * cross-engine via the [[graft.ops.QcOps.hellingerDrift]] float
    * discipline: sufficient statistics (n, Σx, Σx²) are exact BIGINT
    * cents (int64→float64 is correctly rounded everywhere, so the
    * bridge is lossless even past 2⁵³ — the BIGINT exemption
    * DoubleSafetySpec documents); from there every step — the two
    * variance ratios, +, ×, ÷, and crucially √ — is an IEEE
    * correctly-rounded operation BOTH engines perform on identical
    * inputs in the identical order, so t, the Welch–Satterthwaite df,
    * and Cohen's d hash-verify as raw doubles with no integerization.
    * Completes the comparison toolkit: Mann-Whitney (rank), ANOVA
    * (multi-group), CUPED (adjusted), and now the parametric pairwise
    * test everyone reaches for first.
    *
    * Scale: one scan, two aggregation rows, scalar algebra — the 100 TB
    * cost is the scan you were already paying.
    */
  def welchT(s: SparkSession, d: String): DataFrame = {
    val cents = (col("o_totalprice").cast(
      org.apache.spark.sql.types.DecimalType(19, 2)) * lit(100)).cast("long")
    val arms = Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority").as("arm"), cents.as("x"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("x")).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").cast("double").as("sxx"))
    val a = arms.filter(col("arm") === "1-URGENT")
      .select(col("n").as("n1"), col("sx").as("sx1"), col("sxx").as("sxx1"))
    val b = arms.filter(col("arm") === "5-LOW")
      .select(col("n").as("n2"), col("sx").as("sx2"), col("sxx").as("sxx2"))
    a.crossJoin(b) // two 1-row frames
      .withColumn("m1", col("sx1").cast("double") / col("n1").cast("double"))
      .withColumn("m2", col("sx2").cast("double") / col("n2").cast("double"))
      .withColumn("v1",
        (col("sxx1") - col("sx1").cast("double") * col("m1"))
          / (col("n1") - 1).cast("double"))
      .withColumn("v2",
        (col("sxx2") - col("sx2").cast("double") * col("m2"))
          / (col("n2") - 1).cast("double"))
      .withColumn("se1", col("v1") / col("n1").cast("double"))
      .withColumn("se2", col("v2") / col("n2").cast("double"))
      .withColumn("t",
        (col("m1") - col("m2")) / sqrt(col("se1") + col("se2")))
      .withColumn("df",
        (col("se1") + col("se2")) * (col("se1") + col("se2"))
          / (col("se1") * col("se1") / (col("n1") - 1).cast("double")
            + col("se2") * col("se2") / (col("n2") - 1).cast("double")))
      .withColumn("cohens_d",
        (col("m1") - col("m2"))
          / sqrt(((col("n1") - 1).cast("double") * col("v1")
            + (col("n2") - 1).cast("double") * col("v2"))
            / (col("n1") + col("n2") - 2).cast("double")))
      .select(col("n1"), col("n2"), (col("m1") - col("m2")).as("mean_diff"),
        col("t"), col("df"), col("cohens_d"))
  }

  /** RANK-1 ALTERNATING LEAST SQUARES — the collaborative-filtering
    * training loop (Koren et al.'s matrix factorization, the
    * Spark-MLlib ALS shape) at the smallest honest rank: customers and
    * parts each get ONE latent factor, alternately refit in closed form
    * — u ← Σ_p r·v / Σ_p v², then v ← Σ_u r·u / Σ_u u² — which is two
    * rounds of power iteration toward the rating matrix's principal
    * singular pair. Complements [[graft.ops.ExtraOps]]'s item-item CF
    * (`x_item_cf`, neighborhood method) with the model-based method.
    *
    * Cross-engine determinism: factors live in integer milli-units and
    * each closed-form refit is one truncating DIV of two non-negative
    * BIGINT sums — overflow-audited (uf ≤ ~10^5, Σuf² ≤ ~10^12,
    * ·10^6 ≤ ~10^14 « 2^63) — so DuckDB replays the whole training
    * trajectory bit-identically; model fit ships as exact global MAE in
    * micro-units, no float ever enters.
    *
    * At 100 TB: each half-step is ONE keyed join of the rating triples
    * against the small side's factor column plus a map-side-combined
    * aggregation at the other side's grain — the classic ALS shuffle
    * pattern (ratings bucketed by the join key once, factors the small
    * mutating side). Nothing materializes at user×item grain except the
    * rating triples the input already has.
    */
  def alsRank1(s: SparkSession, d: String): DataFrame = {
    val ratings = Tables.lineitem(s, d)
      .filter(col("l_partkey") % 5 === 0)
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey").as("p"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))
      .localCheckpoint() // the loop-invariant triple store, read 4×
    val v0 = ratings.select(col("p")).distinct()
      .withColumn("vf", lit(1000L))
    def userStep(v: DataFrame): DataFrame = ratings.join(v, Seq("p"))
      .groupBy(col("u"))
      .agg(sum(col("r") * col("vf")).as("rv"),
        sum(col("vf") * col("vf")).as("vv"))
      .select(col("u"), expr("(rv * 1000000) DIV vv").as("uf"))
    def itemStep(u: DataFrame): DataFrame = ratings.join(u, Seq("u"))
      .groupBy(col("p"))
      .agg(sum(col("r") * col("uf")).as("ru"),
        sum(col("uf") * col("uf")).as("uu"))
      .select(col("p"), expr("(ru * 1000000) DIV uu").as("vf"))
    val u1 = userStep(v0)
    val v1 = itemStep(u1)
    val u2 = userStep(v1)
    val mae = ratings.join(u2, Seq("u")).join(v1, Seq("p"))
      .agg(expr("sum(abs(r * 1000000 - uf * vf)) DIV count(1)")
        .as("mae_micro"))
    ratings.groupBy(col("p"))
      .agg(count(lit(1)).as("n_raters"), sum(col("r")).as("r_sum"))
      .join(v1, Seq("p"))
      .crossJoin(broadcast(mae)) // 1-row model-fit frame
      .select(col("p").as("part_id"), col("n_raters"), col("r_sum"),
        col("vf").as("v_milli"), col("mae_micro"))
      .orderBy(desc("v_milli"), col("part_id"))
      .limit(15)
  }

  /** DYNAMIC TIME WARPING between the daily click and purchase curves —
    * the alignment distance that tolerates LAG (clicks lead purchases by
    * checkout latency): DTW(i,j) = |a_i−b_j| + min(↑, ←, ↖) over the
    * 30×30 day grid, reported next to the lock-step L1 distance; the
    * gap between them is exactly what warping buys, i.e. how much of
    * the curves' divergence is timing rather than shape. The DP is a
    * BOUNDED-GRID FOLD in the repo's Kleinberg/Viterbi discipline: the
    * corpus collapses map-side to day-grain counts FIRST, then the
    * O(W²)=900-cell recurrence runs as one nested codegen-input
    * aggregate over two 30-element arrays — never a row-expanded
    * window. All costs are BIGINT counts, so the DuckDB oracle replays
    * the identical 870-step cell trajectory (recursive CTE carrying the
    * sliding DP row as a list) bit-for-bit.
    *
    * At 100 TB: the only corpus-grain work is the day-grain count
    * (map-side combined); the quadratic lives on the fixed calendar
    * grid — 900 integer ops per series PAIR, so even all-pairs DTW over
    * thousands of series is centroid-scale work, not fact-scale.
    */
  def dtw(s: SparkSession, d: String): DataFrame = {
    val W = 30
    val wk = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("t"),
        expr("datediff(to_date(ts), DATE '2024-01-01')").as("dday"))
      .groupBy(col("t"), col("dday")).agg(count(lit(1)).as("c"))
    def series(t: String, name: String) = wk.filter(col("t") === t)
      .agg(map_from_entries(collect_list(struct(col("dday"), col("c"))))
        .as("m"))
      .select(expr(
        s"transform(sequence(0, ${W - 1}), i -> coalesce(element_at(m, i), 0L))")
        .as(name))
    val both = series("click", "a").crossJoin(series("purchase", "b"))
    // DP row 1: prefix sums of |a₁ − b_j|
    val r0 =
      s"""aggregate(sequence(2, $W),
         |  array(abs(element_at(a, 1) - element_at(b, 1))),
         |  (acc, j) -> concat(acc, array(abs(element_at(a, 1) - element_at(b, j))
         |    + element_at(acc, j - 1))))""".stripMargin
    // rows 2..W: each row folds over columns with the sliding previous row
    val dp =
      s"""aggregate(sequence(2, $W), $r0,
         |  (prev, i) -> aggregate(sequence(2, $W),
         |    array(abs(element_at(a, i) - element_at(b, 1)) + element_at(prev, 1)),
         |    (cur, j) -> concat(cur, array(abs(element_at(a, i) - element_at(b, j))
         |      + least(element_at(prev, j), element_at(prev, j - 1),
         |              element_at(cur, j - 1))))))""".stripMargin
    both.select(
      expr(s"element_at($dp, $W)").as("dtw_cost"),
      expr(s"aggregate(sequence(1, $W), 0L, " +
        "(acc, i) -> acc + abs(element_at(a, i) - element_at(b, i)))")
        .as("l1_cost"),
      expr("aggregate(a, 0L, (acc, v) -> acc + v)").as("sum_clicks"),
      expr("aggregate(b, 0L, (acc, v) -> acc + v)").as("sum_purchases"),
      lit(W.toLong).as("n_days"))
      .withColumn("warp_gain", col("l1_cost") - col("dtw_cost"))
      .orderBy(col("n_days"))
  }

  /** HOLT-WINTERS TRIPLE EXPONENTIAL SMOOTHING (additive, weekly
    * season) — completing the forecasting ladder [[graft.ext.EventOps
    * .forecastNaive]] → [[croston]] (intermittent) → [[holt]]
    * (level+trend) with the seasonal component: daily click volume has
    * a strong day-of-week cycle, and HW carries level, trend, AND a
    * 7-slot seasonal register, updating the slot of each day's weekday:
    *   lvl ← α(y−s) + (1−α)(lvl+trd);  trd ← β(Δlvl) + (1−β)trd;
    *   s   ← γ(y−lvl) + (1−γ)s                (α=β=γ=1/4)
    * initialized from the first week (lvl₀ = week-1 mean, s₀ = offsets).
    * Per day 7..29 it reports the one-step-ahead forecast lvl+trd+s
    * BEFORE updating — honest backtest residuals, the number a
    * capacity-planning dashboard actually shows.
    *
    * Integer-exact in milli-counts: every smoothing step is
    * (x + 3·state) DIV 4 on BIGINTs; seasonals go negative and both
    * engines truncate toward zero, so the DuckDB recursive-CTE replay
    * is bit-identical. The whole recurrence is ONE bounded fold over a
    * 30-element array (the Kleinberg/Viterbi fold discipline) — the
    * corpus collapses to day grain map-side first.
    */
  def holtWinters(s: SparkSession, d: String): DataFrame = {
    val wk = Tables.events(s, d)
      .filter(col("event_type") === "click")
      .select(expr("datediff(to_date(ts), DATE '2024-01-01')").as("dday"))
      .groupBy(col("dday")).agg(count(lit(1)).as("c"))
    val grid = wk
      .agg(map_from_entries(collect_list(struct(col("dday"), col("c"))))
        .as("m"))
      .select(expr(
        "transform(sequence(0, 29), i -> coalesce(element_at(m, i), 0L) * 1000)")
        .as("a"))
      .withColumn("lvl0", expr("aggregate(slice(a, 1, 7), 0L, (x, v) -> x + v) DIV 7"))
      .withColumn("s0", expr("transform(slice(a, 1, 7), v -> v - lvl0)"))
    grid.select(explode(expr(
      """aggregate(sequence(7, 29),
        |  named_struct('lvl', lvl0, 'trd', CAST(0 AS BIGINT), 's', s0,
        |    'out', CAST(array() AS ARRAY<STRUCT<dday: INT, y: BIGINT,
        |      lvl: BIGINT, trd: BIGINT, fit: BIGINT, err: BIGINT>>)),
        |  (acc, i) -> named_struct(
        |    'lvl', ((element_at(a, i + 1) - element_at(acc.s, CAST(i % 7 + 1 AS INT)))
        |            + 3 * (acc.lvl + acc.trd)) DIV 4,
        |    'trd', ((((element_at(a, i + 1) - element_at(acc.s, CAST(i % 7 + 1 AS INT)))
        |              + 3 * (acc.lvl + acc.trd)) DIV 4 - acc.lvl)
        |            + 3 * acc.trd) DIV 4,
        |    's', transform(sequence(0, 6), k -> IF(k = i % 7,
        |           ((element_at(a, i + 1)
        |             - (((element_at(a, i + 1) - element_at(acc.s, CAST(i % 7 + 1 AS INT)))
        |                 + 3 * (acc.lvl + acc.trd)) DIV 4))
        |            + 3 * element_at(acc.s, CAST(k + 1 AS INT))) DIV 4,
        |           element_at(acc.s, CAST(k + 1 AS INT)))),
        |    'out', array_append(acc.out, named_struct(
        |      'dday', CAST(i AS INT), 'y', element_at(a, i + 1),
        |      'lvl', ((element_at(a, i + 1) - element_at(acc.s, CAST(i % 7 + 1 AS INT)))
        |              + 3 * (acc.lvl + acc.trd)) DIV 4,
        |      'trd', ((((element_at(a, i + 1) - element_at(acc.s, CAST(i % 7 + 1 AS INT)))
        |                + 3 * (acc.lvl + acc.trd)) DIV 4 - acc.lvl)
        |              + 3 * acc.trd) DIV 4,
        |      'fit', acc.lvl + acc.trd + element_at(acc.s, CAST(i % 7 + 1 AS INT)),
        |      'err', element_at(a, i + 1)
        |             - (acc.lvl + acc.trd + element_at(acc.s, CAST(i % 7 + 1 AS INT)))))),
        |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.dday").as("dday"), col("r.y").as("y_milli"),
        col("r.lvl").as("level_milli"), col("r.trd").as("trend_milli"),
        col("r.fit").as("forecast_milli"), col("r.err").as("resid_milli"))
      .orderBy(col("dday"))
  }

  /** MONDRIAN SPLIT CONFORMAL PREDICTION — the distribution-free
    * uncertainty wrapper every deployed point-predictor should ship
    * with: hold out a calibration split, take the ⌈(n+1)(1−α)⌉-th
    * smallest absolute residual as the interval half-width q, and
    * pred ± q covers a fresh point with probability ≥ 1−α, NO
    * distributional assumptions (Vovk; Lei et al.). Group-conditional
    * ("Mondrian") per order priority, so each segment gets its own
    * honest width — the per-cohort guarantee product teams actually
    * need. α = 1/10; the base predictor is the calibration group mean
    * (any model slots in; conformal wraps it unchanged). Reported per
    * group: calibration size, point prediction, q, and the EMPIRICAL
    * coverage on the disjoint test split as exact counts + ppm.
    *
    * Integer-exact: money in cents, the quantile is an ORDER STATISTIC
    * (rank ⌈(n+1)·9/10⌉ via one partitioned window, fully keyed
    * order), coverage is a count — nothing floats, the oracle replays
    * rank and counts bit-identically.
    *
    * At 100 TB: one scan splits calibration/test by key hash; the
    * rank runs per GROUP (partitioned window over the calibration
    * split — at extreme group sizes swap in the bucketed-histogram
    * quantile exactly like x_auc_bucketed); coverage is a
    * map-side-combined rollup.
    */
  def conformal(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("g"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")
        .as("y"),
      col("o_orderkey").as("key"))
    val cal = o.filter(col("key") % 4 === 1)
    val tst = o.filter(col("key") % 4 === 2)
    val pred = cal.groupBy(col("g"))
      .agg(expr("SUM(y) DIV COUNT(1)").as("pred"),
        count(lit(1)).as("n_cal"))
    val resid = cal.join(pred, Seq("g"))
      .select(col("g"), abs(col("y") - col("pred")).as("r"), col("key"),
        col("n_cal"))
    val ranked = resid.withColumn("rn", row_number()
      .over(Window.partitionBy(col("g")).orderBy(col("r"), col("key"))))
    val q = ranked.filter(col("rn") === expr("((n_cal + 1) * 9 + 9) DIV 10"))
      .select(col("g"), col("r").as("q_cents"))
    tst.join(pred, Seq("g")).join(q, Seq("g"))
      .groupBy(col("g"))
      .agg(max(col("n_cal")).as("n_cal"), max(col("pred")).as("pred_cents"),
        max(col("q_cents")).as("q_cents"), count(lit(1)).as("n_test"),
        sum(when(abs(col("y") - col("pred")) <= col("q_cents"), 1L)
          .otherwise(0L)).as("covered"))
      .withColumn("coverage_ppm", expr("(covered * 1000000) DIV n_test"))
      .select(col("g"), col("n_cal"), col("pred_cents"), col("q_cents"),
        col("n_test"), col("covered"), col("coverage_ppm"))
      .orderBy(col("g"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_conformal" -> conformal,
    "x_holt_winters" -> holtWinters,
    "x_dtw" -> dtw,
    "x_als_rank1" -> alsRank1,
    "x_welch_t" -> welchT,
    "x_hits" -> hits,
    "x_autocorr" -> autocorr,
    "x_elasticity" -> elasticity,
    "x_page_hinkley" -> pageHinkley,
    "x_croston" -> croston,
    "x_mutual_info" -> mutualInfo,
    "x_naive_bayes" -> naiveBayes,
    "x_isotonic" -> isotonic,
    "x_boost_majority" -> boostMajority,
    "x_bandit_replay" -> banditReplay,
    "x_decision_stump" -> decisionStump,
    "x_auc" -> auc,
    "x_auc_bucketed" -> aucBucketed,
    "x_bootstrap_ci" -> bootstrapCi,
    "x_reservoir" -> reservoir,
    "x_holt" -> holt,
    "x_collation" -> collation)

  def oracle: Map[String, String] = Map(
    "x_conformal" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS g,
        |         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |           AS y,
        |         o_orderkey AS key
        |  FROM orders),
        |cal AS (SELECT * FROM o WHERE key % 4 = 1),
        |tst AS (SELECT * FROM o WHERE key % 4 = 2),
        |pred AS (
        |  SELECT g, CAST(SUM(y) // COUNT(*) AS BIGINT) AS pred,
        |         CAST(COUNT(*) AS BIGINT) AS n_cal
        |  FROM cal GROUP BY g),
        |ranked AS (
        |  SELECT cal.g, abs(y - pred) AS r, n_cal,
        |         row_number() OVER (PARTITION BY cal.g
        |           ORDER BY abs(y - pred), key) AS rn
        |  FROM cal JOIN pred USING (g)),
        |q AS (
        |  SELECT g, r AS q_cents FROM ranked
        |  WHERE rn = ((n_cal + 1) * 9 + 9) // 10)
        |SELECT g, CAST(MAX(n_cal) AS BIGINT) AS n_cal,
        |       CAST(MAX(pred) AS BIGINT) AS pred_cents,
        |       CAST(MAX(q_cents) AS BIGINT) AS q_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_test,
        |       CAST(SUM(CASE WHEN abs(y - pred) <= q_cents THEN 1 ELSE 0 END)
        |         AS BIGINT) AS covered,
        |       (CAST(SUM(CASE WHEN abs(y - pred) <= q_cents THEN 1 ELSE 0 END)
        |         AS BIGINT) * 1000000) // COUNT(*) AS coverage_ppm
        |FROM tst JOIN pred USING (g) JOIN q USING (g)
        |GROUP BY g ORDER BY g""".stripMargin,
    "x_holt_winters" ->
      """WITH RECURSIVE wk AS (
        |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dday,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |grid AS (
        |  SELECT g.i AS dday, COALESCE(k.c, 0) * 1000 AS y
        |  FROM range(0, 30) g(i) LEFT JOIN wk k ON k.dday = g.i),
        |arr AS (SELECT array_agg(y ORDER BY dday) AS a FROM grid),
        |init AS (
        |  SELECT a,
        |         (a[1] + a[2] + a[3] + a[4] + a[5] + a[6] + a[7]) // 7 AS lvl0
        |  FROM arr),
        |i2 AS (
        |  SELECT a, lvl0,
        |         [a[k + 1] - lvl0 FOR k IN range(0, 7)] AS s0
        |  FROM init),
        |hw AS (
        |  SELECT 6 AS i, lvl0 AS lvl, CAST(0 AS BIGINT) AS trd, s0 AS s,
        |         CAST(0 AS BIGINT) AS y, CAST(0 AS BIGINT) AS fit,
        |         CAST(0 AS BIGINT) AS err, a
        |  FROM i2
        |  UNION ALL
        |  SELECT i + 1,
        |    ((a[i + 2] - s[(i + 1) % 7 + 1]) + 3 * (lvl + trd)) // 4,
        |    (((((a[i + 2] - s[(i + 1) % 7 + 1]) + 3 * (lvl + trd)) // 4) - lvl)
        |      + 3 * trd) // 4,
        |    [CASE WHEN k = (i + 1) % 7
        |          THEN ((a[i + 2]
        |                 - (((a[i + 2] - s[(i + 1) % 7 + 1])
        |                     + 3 * (lvl + trd)) // 4))
        |                + 3 * s[k + 1]) // 4
        |          ELSE s[k + 1] END FOR k IN range(0, 7)],
        |    a[i + 2],
        |    lvl + trd + s[(i + 1) % 7 + 1],
        |    a[i + 2] - (lvl + trd + s[(i + 1) % 7 + 1]),
        |    a
        |  FROM hw WHERE i < 29)
        |SELECT CAST(i AS INT) AS dday, y AS y_milli, lvl AS level_milli,
        |       trd AS trend_milli, fit AS forecast_milli, err AS resid_milli
        |FROM hw WHERE i >= 7 ORDER BY dday""".stripMargin,
    "x_dtw" ->
      """WITH RECURSIVE wk AS (
        |  SELECT event_type AS t,
        |         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dday,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |ga AS (SELECT g.i AS dday, COALESCE(k.c, 0) AS c
        |       FROM range(0, 30) g(i)
        |       LEFT JOIN wk k ON k.t = 'click' AND k.dday = g.i),
        |gb AS (SELECT g.i AS dday, COALESCE(k.c, 0) AS c
        |       FROM range(0, 30) g(i)
        |       LEFT JOIN wk k ON k.t = 'purchase' AND k.dday = g.i),
        |ab AS (SELECT (SELECT array_agg(c ORDER BY dday) FROM ga) AS a,
        |              (SELECT array_agg(c ORDER BY dday) FROM gb) AS b),
        |r0 AS (SELECT a, b, array_agg(s ORDER BY jj) AS row0 FROM (
        |  SELECT a, b, jj,
        |         SUM(abs(a[1] - b[jj])) OVER (ORDER BY jj) AS s
        |  FROM ab, range(1, 31) r(jj)) GROUP BY a, b),
        |walk AS (
        |  SELECT 0 AS s, CAST([] AS BIGINT[]) AS prev, row0 AS cur, a, b
        |  FROM r0
        |  UNION ALL
        |  SELECT s + 1,
        |    CASE WHEN (s % 30) = 0 THEN cur ELSE prev END,
        |    CASE WHEN (s % 30) = 0
        |      THEN [abs(a[2 + s // 30] - b[1]) + cur[1]]
        |      ELSE list_append(cur,
        |             abs(a[2 + s // 30] - b[1 + (s % 30)])
        |             + least(prev[1 + (s % 30)], prev[s % 30], cur[s % 30]))
        |    END,
        |    a, b
        |  FROM walk WHERE s < 870)
        |SELECT CAST(cur[30] AS BIGINT) AS dtw_cost,
        |       (SELECT CAST(SUM(abs(a[jj] - b[jj])) AS BIGINT)
        |        FROM range(1, 31) r(jj)) AS l1_cost,
        |       (SELECT CAST(SUM(c) AS BIGINT) FROM ga) AS sum_clicks,
        |       (SELECT CAST(SUM(c) AS BIGINT) FROM gb) AS sum_purchases,
        |       CAST(30 AS BIGINT) AS n_days,
        |       (SELECT CAST(SUM(abs(a[jj] - b[jj])) AS BIGINT)
        |        FROM range(1, 31) r(jj)) - CAST(cur[30] AS BIGINT) AS warp_gain
        |FROM walk WHERE s = 870
        |ORDER BY n_days""".stripMargin,
    "x_als_rank1" ->
      """WITH ratings AS (
        |  SELECT o_custkey AS u, l_partkey AS p,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey % 5 = 0
        |  GROUP BY 1, 2),
        |u1 AS (
        |  SELECT u, (SUM(r * 1000) * 1000000) // SUM(CAST(1000000 AS BIGINT))
        |           AS uf
        |  FROM ratings GROUP BY u),
        |v1 AS (
        |  SELECT p, (SUM(r * uf) * 1000000) // SUM(uf * uf) AS vf
        |  FROM ratings JOIN u1 USING (u) GROUP BY p),
        |u2 AS (
        |  SELECT u, (SUM(r * vf) * 1000000) // SUM(vf * vf) AS uf
        |  FROM ratings JOIN v1 USING (p) GROUP BY u),
        |mae AS (
        |  SELECT CAST(SUM(abs(r * 1000000 - uf * vf)) // COUNT(*) AS BIGINT)
        |           AS mae_micro
        |  FROM ratings JOIN u2 USING (u) JOIN v1 USING (p))
        |SELECT p AS part_id, CAST(COUNT(*) AS BIGINT) AS n_raters,
        |       CAST(SUM(r) AS BIGINT) AS r_sum,
        |       CAST(MAX(vf) AS BIGINT) AS v_milli,
        |       CAST(MAX(mae_micro) AS BIGINT) AS mae_micro
        |FROM ratings JOIN v1 USING (p) CROSS JOIN mae
        |GROUP BY p
        |ORDER BY v_milli DESC, part_id LIMIT 15""".stripMargin,
    "x_bandit_replay" ->
      """WITH RECURSIVE log0 AS (
        |  SELECT epoch_us(ts) AS t, event_id,
        |    CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
        |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS arm,
        |    CAST(value > 50.0 AS BIGINT) AS rw
        |  FROM events WHERE event_id % 11 = 0),
        |lg AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY t, event_id) AS BIGINT) AS rn,
        |         CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM log0),
        |sim AS (
        |  SELECT CAST(0 AS BIGINT) AS rn,
        |         [CAST(0 AS BIGINT) for i in range(0, 5)] AS p,
        |         [CAST(0 AS BIGINT) for i in range(0, 5)] AS r,
        |         n
        |  FROM (SELECT DISTINCT n FROM lg)
        |  UNION ALL
        |  SELECT l.rn,
        |    CASE WHEN s.best = l.arm
        |         THEN [CASE WHEN j = l.arm THEN s.p[j + 1] + 1
        |                    ELSE s.p[j + 1] END for j in range(0, 5)]
        |         ELSE s.p END,
        |    CASE WHEN s.best = l.arm
        |         THEN [CASE WHEN j = l.arm THEN s.r[j + 1] + l.rw
        |                    ELSE s.r[j + 1] END for j in range(0, 5)]
        |         ELSE s.r END,
        |    s.n
        |  FROM (SELECT *, list_reduce([0, 1, 2, 3, 4], (b, i) ->
        |          CASE WHEN (r[i + 1] + 1) * (p[b + 1] + 2) >
        |                    (r[b + 1] + 1) * (p[i + 1] + 2)
        |               THEN i ELSE b END) AS best
        |        FROM sim) s
        |  JOIN lg l ON l.rn = s.rn + 1),
        |fin AS (SELECT p, r FROM sim WHERE rn = n),
        |ch(arm, arm_name) AS (
        |  VALUES (0, 'click'), (1, 'error'), (2, 'purchase'),
        |         (3, 'signup'), (4, 'view'))
        |SELECT arm_name, CAST(p[arm + 1] AS BIGINT) AS pulls,
        |       CAST(r[arm + 1] AS BIGINT) AS rewards,
        |       CASE WHEN p[arm + 1] > 0
        |            THEN (r[arm + 1] * 1000000) // p[arm + 1]
        |            ELSE CAST(0 AS BIGINT) END AS reward_ppm
        |FROM ch, fin ORDER BY arm_name""".stripMargin,
    "x_boost_majority" -> {
      def stumpCte(wt: String, name: String) =
        s"""$name AS (
           |  SELECT b, side, err FROM (
           |    SELECT b,
           |      least(p0 + tp - p1, p1 + tq - p0) AS err,
           |      CASE WHEN p0 + tp - p1 <= p1 + tq - p0
           |           THEN 'pos_if_le' ELSE 'pos_if_gt' END AS side
           |    FROM (
           |      SELECT b,
           |        CAST(SUM(w1) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
           |          PRECEDING AND CURRENT ROW) AS BIGINT) AS p1,
           |        CAST(SUM(w0) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
           |          PRECEDING AND CURRENT ROW) AS BIGINT) AS p0,
           |        tp, tq
           |      FROM $wt, (SELECT CAST(SUM(w1) AS BIGINT) AS tp,
           |                        CAST(SUM(w0) AS BIGINT) AS tq FROM $wt) t))
           |  ORDER BY err, b LIMIT 1)"""
      def updCte(wt: String, st: String, name: String) =
        s"""$name AS (
           |  SELECT w.b,
           |    CASE WHEN (s.side = 'pos_if_le' AND w.b <= s.b)
           |           OR (s.side = 'pos_if_gt' AND w.b > s.b)
           |         THEN w.w1 ELSE w.w1 * 2 END AS w1,
           |    CASE WHEN (s.side = 'pos_if_le' AND w.b <= s.b)
           |           OR (s.side = 'pos_if_gt' AND w.b > s.b)
           |         THEN w.w0 * 2 ELSE w.w0 END AS w0
           |  FROM $wt w, $st s)"""
      def vote(st: String) =
        s"""CASE WHEN ($st.side = 'pos_if_le' AND g.b <= $st.b)
           |       OR ($st.side = 'pos_if_gt' AND g.b > $st.b)
           |     THEN 1 ELSE -1 END""".stripMargin
      s"""WITH g0 AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
         |           // 65536 AS b
         |  FROM orders),
         |g AS (
         |  SELECT b,
         |         CAST(SUM(CASE WHEN b BETWEEN 229 AND 457
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |         CAST(SUM(CASE WHEN b BETWEEN 229 AND 457
         |                       THEN 0 ELSE 1 END) AS BIGINT) AS n0
         |  FROM g0 GROUP BY 1),
         |w1t AS (SELECT b, n1 AS w1, n0 AS w0 FROM g),
         |${stumpCte("w1t", "s1")},
         |${updCte("w1t", "s1", "w2t")},
         |${stumpCte("w2t", "s2")},
         |${updCte("w2t", "s2", "w3t")},
         |${stumpCte("w3t", "s3")},
         |ens AS (
         |  SELECT g.n1, g.n0,
         |    ${vote("s1")} AS v1, ${vote("s2")} AS v2, ${vote("s3")} AS v3
         |  FROM g, s1, s2, s3)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS round, s1.b AS threshold_bucket,
         |         s1.side, s1.err AS weighted_err,
         |         (SELECT CAST(SUM(CASE WHEN v1 > 0 THEN n0 ELSE n1 END)
         |            AS BIGINT) FROM ens) AS ensemble_err
         |  FROM s1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), s2.b, s2.side, s2.err,
         |         (SELECT CAST(SUM(CASE WHEN v1 + v2 > 0 THEN n0 ELSE n1 END)
         |            AS BIGINT) FROM ens)
         |  FROM s2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), s3.b, s3.side, s3.err,
         |         (SELECT CAST(SUM(CASE WHEN v1 + v2 + v3 > 0 THEN n0 ELSE n1 END)
         |            AS BIGINT) FROM ens)
         |  FROM s3)
         |ORDER BY round""".stripMargin
    },
    "x_naive_bayes" -> {
      import graft.ext.FixLog.lgD
      s"""WITH train AS (
         |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0),
         |test AS (
         |  SELECT doc_id, lang AS lang_true, text FROM documents
         |  WHERE doc_id % 5 = 0),
         |ttok AS (
         |  SELECT lang, w FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM train)
         |  WHERE w <> ''),
         |counts AS (
         |  SELECT lang AS lang_cand, w, CAST(COUNT(*) AS BIGINT) AS cw
         |  FROM ttok GROUP BY 1, 2),
         |cand AS (
         |  SELECT l.lang_cand, l.toks, dd.nd, v.v, nt.n
         |  FROM (SELECT lang AS lang_cand, CAST(COUNT(*) AS BIGINT) AS toks
         |        FROM ttok GROUP BY 1) l
         |  JOIN (SELECT lang AS lang_cand, CAST(COUNT(*) AS BIGINT) AS nd
         |        FROM train GROUP BY 1) dd USING (lang_cand),
         |       (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM ttok) v,
         |       (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM train) nt),
         |tetok AS (
         |  SELECT doc_id, lang_true, w FROM (
         |    SELECT doc_id, lang_true, unnest(string_split(text, ' ')) AS w
         |    FROM test)
         |  WHERE w <> ''),
         |terms AS (
         |  SELECT p.doc_id, p.lang_true, c.lang_cand, c.toks, c.nd, c.v, c.n,
         |         COALESCE(cn.cw, 0) + 1 AS cw1
         |  FROM tetok p CROSS JOIN cand c
         |  LEFT JOIN counts cn ON cn.lang_cand = c.lang_cand AND cn.w = p.w),
         |ds AS (
         |  SELECT doc_id, lang_true, lang_cand, toks, nd, v, n,
         |         CAST(COUNT(*) AS BIGINT) AS m,
         |         CAST(SUM(${lgD("cw1")}) AS BIGINT) AS sumlg
         |  FROM terms GROUP BY 1, 2, 3, 4, 5, 6, 7),
         |sc AS (
         |  SELECT doc_id, lang_true, lang_cand,
         |         ${lgD("nd")} - ${lgD("n")} - m * ${lgD("toks + v")} + sumlg
         |           AS score
         |  FROM ds),
         |pred AS (
         |  SELECT doc_id, lang_true, lang_cand AS lang_pred,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score DESC, lang_cand) AS rk
         |  FROM sc)
         |SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "x_mutual_info" -> {
      import graft.ext.FixLog.lgD
      def ent(group: String, n: String) =
        s"""(SELECT ${lgD("nn")} - (slg // nn) AS $n FROM (
           |  SELECT MAX(nn) AS nn, CAST(SUM(c * ${lgD("c")}) AS BIGINT) AS slg
           |  FROM (SELECT $group, CAST(COUNT(*) AS BIGINT) AS c
           |        FROM documents GROUP BY $group) x,
           |       (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents) t))"""
          .stripMargin
      s"""WITH hl AS ${ent("lang", "h_lang_fp")},
         |hs AS ${ent("source", "h_source_fp")},
         |hj AS ${ent("lang, source", "h_joint_fp")},
         |f AS (
         |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         |         h_lang_fp, h_source_fp, h_joint_fp,
         |         h_lang_fp + h_source_fp - h_joint_fp AS mi_fp
         |  FROM hl, hs, hj)
         |SELECT n_docs, h_lang_fp, h_source_fp, h_joint_fp, mi_fp,
         |       CAST(mi_fp AS DOUBLE) / 65536.0 AS mi_bits
         |FROM f""".stripMargin
    },
    "x_isotonic" ->
      """WITH g AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |           // 65536 AS b,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |pr AS (
        |  SELECT b, n1, n,
        |         CAST(SUM(n1) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
        |         CAST(SUM(n) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
        |  FROM g),
        |pairs AS (
        |  SELECT j.b AS jb, k.b AS kb,
        |         CAST(k.cp - (j.cp - j.n1) AS DOUBLE)
        |           / CAST(k.cc - (j.cc - j.n) AS DOUBLE) AS mean
        |  FROM pr j JOIN pr k ON j.b <= k.b),
        |sm AS (
        |  SELECT jb, kb,
        |         MIN(mean) OVER (PARTITION BY jb ORDER BY kb DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mj
        |  FROM pairs),
        |iso AS (
        |  SELECT kb AS b, MAX(mj) AS iso_fit FROM sm GROUP BY 1)
        |SELECT g.b, g.n, g.n1, (g.n1 * 1000000) // g.n AS raw_rate_ppm,
        |       iso.iso_fit
        |FROM g JOIN iso ON g.b = iso.b ORDER BY g.b""".stripMargin,
    "x_decision_stump" ->
      """WITH g AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |           // 65536 AS b,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 0 ELSE 1 END) AS BIGINT) AS n0
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(n1) AS BIGINT) AS tp,
        |             CAST(SUM(n0) AS BIGINT) AS tq,
        |             CAST(COUNT(*) AS BIGINT) AS n_buckets FROM g),
        |sc AS (
        |  SELECT b,
        |         CAST(SUM(n1) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS p1,
        |         CAST(SUM(n0) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS p0,
        |         tp, tq, n_buckets
        |  FROM g, t),
        |e AS (
        |  SELECT b, tp, tq, n_buckets,
        |         p0 + tp - p1 AS err_le, p1 + tq - p0 AS err_gt
        |  FROM sc),
        |f AS (
        |  SELECT b AS threshold_bucket,
        |         CASE WHEN err_le <= err_gt THEN 'pos_if_le'
        |              ELSE 'pos_if_gt' END AS side,
        |         least(err_le, err_gt) AS errors,
        |         least(tp, tq) AS base_errors, n_buckets,
        |         ((tp + tq - least(err_le, err_gt)) * 1000000) // (tp + tq)
        |           AS accuracy_ppm
        |  FROM e ORDER BY errors, threshold_bucket LIMIT 1)
        |SELECT * FROM f""".stripMargin,
    "x_croston" ->
      """WITH RECURSIVE dem AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey % 997 = 0 GROUP BY 1),
        |ev AS (
        |  SELECT day, q,
        |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
        |         CAST(COALESCE(date_diff('day',
        |           lag(day) OVER (ORDER BY day), day), 1) AS BIGINT) AS gap
        |  FROM dem),
        |cr(i, z, p) AS (
        |  SELECT i, q, gap FROM ev WHERE i = 1
        |  UNION ALL
        |  SELECT e.i, c.z + (e.q - c.z) // 8, c.p + (e.gap - c.p) // 8
        |  FROM cr c JOIN ev e ON e.i = c.i + 1)
        |SELECT e.day, e.q AS demand, e.gap AS gap_days,
        |       c.z AS z_size, c.p AS p_interval,
        |       (c.z * 1000000) // greatest(CAST(1 AS BIGINT), c.p)
        |         AS rate_ppm
        |FROM ev e JOIN cr c ON c.i = e.i ORDER BY day""".stripMargin,
    "x_page_hinkley" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(x) AS BIGINT) AS sx FROM daily),
        |m AS (
        |  SELECT day, x,
        |         CAST(SUM(50 * n * x - 51 * sx) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS m, sx
        |  FROM daily, t),
        |p AS (
        |  SELECT day, x, sx,
        |         m - CAST(MIN(m) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS ph
        |  FROM m)
        |SELECT day, x AS rev_cents, ph, ph > 20 * sx AS alarm
        |FROM p ORDER BY day""".stripMargin,
    "x_elasticity" -> {
      import graft.ext.FixLog.lgD
      s"""WITH pp AS (
         |  SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
         |           AS BIGINT)) AS BIGINT) AS rev_cents
         |  FROM lineitem GROUP BY l_partkey
         |  HAVING q >= 1 AND rev_cents >= q),
         |xy AS (
         |  SELECT ${lgD("(rev_cents // q)")} AS x, ${lgD("q")} AS y FROM pp),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |         CAST(SUM(x * y) AS BIGINT) AS sxy,
         |         CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM xy),
         |f AS (
         |  SELECT n, sx, sy,
         |         CAST(CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
         |             - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS VARCHAR)
         |           AS DOUBLE)
         |         / CAST(CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
         |             - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS VARCHAR)
         |           AS DOUBLE) AS elasticity
         |  FROM m)
         |SELECT n AS n_parts, elasticity,
         |       (CAST(sy AS DOUBLE) - elasticity * CAST(sx AS DOUBLE))
         |         / CAST(n AS DOUBLE) / 65536.0 AS intercept_bits
         |FROM f""".stripMargin
    },
    "x_welch_t" ->
      """WITH arms AS (
        |  SELECT o_orderpriority AS arm,
        |         CAST(CAST(o_totalprice AS DECIMAL(19,2)) * 100 AS BIGINT) AS x
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |st AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx,
        |         CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
        |              AS VARCHAR)::DOUBLE AS sxx
        |  FROM arms GROUP BY 1),
        |j AS (
        |  SELECT a.n AS n1, a.sx AS sx1, a.sxx AS sxx1,
        |         b.n AS n2, b.sx AS sx2, b.sxx AS sxx2
        |  FROM (SELECT * FROM st WHERE arm = '1-URGENT') a
        |  CROSS JOIN (SELECT * FROM st WHERE arm = '5-LOW') b),
        |m AS (
        |  SELECT *, CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |            CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2
        |  FROM j),
        |v AS (
        |  SELECT *,
        |    (sxx1 - CAST(sx1 AS DOUBLE) * m1) / CAST(n1 - 1 AS DOUBLE) AS v1,
        |    (sxx2 - CAST(sx2 AS DOUBLE) * m2) / CAST(n2 - 1 AS DOUBLE) AS v2
        |  FROM m),
        |se AS (
        |  SELECT *, v1 / CAST(n1 AS DOUBLE) AS se1,
        |            v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM v)
        |SELECT n1, n2, m1 - m2 AS mean_diff,
        |       (m1 - m2) / SQRT(se1 + se2) AS t,
        |       (se1 + se2) * (se1 + se2)
        |         / (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
        |            + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS df,
        |       (m1 - m2) / SQRT((CAST(n1 - 1 AS DOUBLE) * v1
        |                         + CAST(n2 - 1 AS DOUBLE) * v2)
        |                        / CAST(n1 + n2 - 2 AS DOUBLE)) AS cohens_d
        |FROM se""".stripMargin,
    "x_hits" -> {
      val S = "1000000000000"
      def normed(prev: String, out: String, key: String, sc: String): String =
        s"""$out AS MATERIALIZED (SELECT $key,
           |  CAST(CAST(x AS HUGEINT) * $S // (SELECT SUM(x) FROM $prev)
           |       AS BIGINT) AS $sc FROM $prev)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM e),
         |a1p AS (SELECT e.sup, CAST(SUM(h.h) AS BIGINT) AS x
         |        FROM e JOIN h0 h USING (c) GROUP BY e.sup),
         |${normed("a1p", "a1", "sup", "a")},
         |h1p AS (SELECT e.c, CAST(SUM(a1.a) AS BIGINT) AS x
         |        FROM e JOIN a1 USING (sup) GROUP BY e.c),
         |${normed("h1p", "h1", "c", "h")},
         |a2p AS (SELECT e.sup, CAST(SUM(h1.h) AS BIGINT) AS x
         |        FROM e JOIN h1 USING (c) GROUP BY e.sup),
         |${normed("a2p", "a2", "sup", "a")},
         |h2p AS (SELECT e.c, CAST(SUM(a2.a) AS BIGINT) AS x
         |        FROM e JOIN a2 USING (sup) GROUP BY e.c),
         |${normed("h2p", "h2", "c", "h")}
         |SELECT 'authority' AS node_type, sup AS node_id, a AS score FROM a2
         |UNION ALL SELECT 'hub', c, h FROM h2
         |ORDER BY node_type, score DESC, node_id""".stripMargin
    },
    "x_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |                       AS DECIMAL(19,0))) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT UNNEST([1, 2, 7]) AS lag),
        |p AS (
        |  SELECT l.lag, COUNT(*) AS n_pairs,
        |         SUM(CAST(a.y AS DECIMAL(19,0))) AS sx,
        |         SUM(CAST(b.y AS DECIMAL(19,0))) AS sy,
        |         SUM(CAST(a.y AS DECIMAL(19,0)) * CAST(b.y AS DECIMAL(19,0))) AS sxy,
        |         SUM(CAST(a.y AS DECIMAL(19,0)) * CAST(a.y AS DECIMAL(19,0))) AS sxx,
        |         SUM(CAST(b.y AS DECIMAL(19,0)) * CAST(b.y AS DECIMAL(19,0))) AS syy
        |  FROM lags l
        |  JOIN daily a ON true
        |  JOIN daily b ON b.day = a.day - l.lag
        |  GROUP BY l.lag)
        |SELECT lag, n_pairs,
        |       CAST(CAST(n_pairs * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        |         / (sqrt(CAST(CAST(n_pairs * sxx - sx * sx AS VARCHAR) AS DOUBLE))
        |            * sqrt(CAST(CAST(n_pairs * syy - sy * sy AS VARCHAR) AS DOUBLE)))
        |         AS acf
        |FROM p ORDER BY lag""".stripMargin,
    "x_auc" ->
      """WITH v AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS score,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 0 ELSE 1 END) AS BIGINT) AS n0
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT n1, n0,
        |         COALESCE(CAST(SUM(n0) OVER (ORDER BY score
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |           0) AS cum0
        |  FROM v),
        |t AS (
        |  SELECT CAST(SUM(n1) AS BIGINT) AS n_pos,
        |         CAST(SUM(n0) AS BIGINT) AS n_neg,
        |         CAST(SUM(n1 * (2 * cum0 + n0)) AS BIGINT) AS num2
        |  FROM c)
        |SELECT n_pos, n_neg,
        |       CAST(num2 AS DOUBLE) / (2.0 * n_pos * n_neg) AS auc,
        |       2.0 * (CAST(num2 AS DOUBLE) / (2.0 * n_pos * n_neg)) - 1.0
        |         AS auc_gini
        |FROM t""".stripMargin,
    "x_auc_bucketed" ->
      """WITH v AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) // 65536
        |           AS bucket,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                       THEN 0 ELSE 1 END) AS BIGINT) AS n0
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT n1, n0,
        |         COALESCE(CAST(SUM(n0) OVER (ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |           0) AS cum0
        |  FROM v),
        |t AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |         CAST(SUM(n1) AS BIGINT) AS n_pos,
        |         CAST(SUM(n0) AS BIGINT) AS n_neg,
        |         CAST(SUM(n1 * (2 * cum0 + n0)) AS BIGINT) AS num2,
        |         CAST(SUM(n1 * n0) AS BIGINT) AS tie2
        |  FROM c)
        |SELECT n_buckets, n_pos, n_neg,
        |       CAST(num2 AS DOUBLE) / (2.0 * n_pos * n_neg) AS auc_bucketed,
        |       CAST(tie2 AS DOUBLE) / (2.0 * n_pos * n_neg) AS tie_halfwidth
        |FROM t""".stripMargin,
    "x_reservoir" -> {
      import graft.ext.FixLog.lgD
      val u =
        s"(${Hashing.duckHash("CAST(doc_id AS VARCHAR)")} % 1000000 + 1)"
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split(text, ' '),
         |                         x -> len(x) > 0)) AS BIGINT) AS w,
         |    CAST($u AS BIGINT) AS u
         |  FROM documents
         |  WHERE len(list_filter(string_split(text, ' '),
         |                        x -> len(x) > 0)) >= 1),
         |p AS (
         |  SELECT *,
         |    CAST(${lgD("u")} - ${lgD("CAST(1000000 AS BIGINT)")} AS DOUBLE)
         |      / CAST(w AS DOUBLE) AS prio
         |  FROM t),
         |r AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY prio DESC, doc_id)
         |    AS BIGINT) AS rank, doc_id, source, w, u, prio
         |  FROM p)
         |SELECT rank, doc_id, source, w, u, prio FROM r
         |WHERE rank <= 50 ORDER BY rank""".stripMargin
    },
    "x_bootstrap_ci" -> {
      val a = Hashing.duckHashSlice("CAST(o_orderkey AS VARCHAR)", 1, 15)
      val c = Hashing.duckHashSlice("CAST(o_orderkey AS VARCHAR)", 16, 15)
      s"""WITH reps AS (
         |  SELECT b,
         |         CAST(SUM(w * x) AS BIGINT) AS swx,
         |         CAST(SUM(w) AS BIGINT) AS sw
         |  FROM (
         |    SELECT g.b, o.o_orderkey,
         |           CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS x,
         |           CASE WHEN (($a % 999983) * (g.b + 1)
         |                      + ($c % 999983)) % 999983 < 367879 THEN 0
         |                WHEN (($a % 999983) * (g.b + 1)
         |                      + ($c % 999983)) % 999983 < 735758 THEN 1
         |                WHEN (($a % 999983) * (g.b + 1)
         |                      + ($c % 999983)) % 999983 < 919698 THEN 2
         |                WHEN (($a % 999983) * (g.b + 1)
         |                      + ($c % 999983)) % 999983 < 981011 THEN 3
         |                WHEN (($a % 999983) * (g.b + 1)
         |                      + ($c % 999983)) % 999983 < 996340 THEN 4
         |                WHEN (($a % 999983) * (g.b + 1)
         |                      + ($c % 999983)) % 999983 < 999405 THEN 5
         |                ELSE 6 END AS w
         |    FROM orders o CROSS JOIN generate_series(0, 39) AS g(b))
         |  GROUP BY b),
         |ranked AS (
         |  SELECT CAST(swx AS DOUBLE) / sw AS mean_b,
         |         ROW_NUMBER() OVER (ORDER BY CAST(swx AS DOUBLE) / sw, b) AS rn
         |  FROM reps),
         |ci AS (
         |  SELECT MIN(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
         |         MAX(CASE WHEN rn = 39 THEN mean_b END) AS ci_hi,
         |         CAST(COUNT(*) AS BIGINT) AS b_reps
         |  FROM ranked)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         |       CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
         |                          AS BIGINT)) AS BIGINT) AS DOUBLE)
         |         / COUNT(*) AS point_mean,
         |       (SELECT ci_lo FROM ci) AS ci_lo,
         |       (SELECT ci_hi FROM ci) AS ci_hi,
         |       (SELECT b_reps FROM ci) AS b_reps
         |FROM orders""".stripMargin
    },
    "x_holt" ->
      """WITH RECURSIVE monthly AS (
        |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |                       AS DECIMAL(19,0))) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |m AS (SELECT ROW_NUMBER() OVER (ORDER BY month) AS rn, month, y
        |      FROM monthly),
        |r AS (
        |  SELECT rn, month, y, y AS lvl, CAST(0 AS BIGINT) AS trd
        |  FROM m WHERE rn = 1
        |  UNION ALL
        |  SELECT m.rn, m.month, m.y,
        |         (m.y + 3 * (r.lvl + r.trd)) // 4 AS lvl,
        |         (((m.y + 3 * (r.lvl + r.trd)) // 4 - r.lvl) + 3 * r.trd) // 4
        |           AS trd
        |  FROM r JOIN m ON m.rn = r.rn + 1)
        |SELECT month, y AS rev_cents, CAST(lvl AS BIGINT) AS level_cents,
        |       CAST(trd AS BIGINT) AS trend_cents
        |FROM r ORDER BY month""".stripMargin,
    "x_collation" ->
      """WITH v AS (
        |  SELECT CASE CAST(c_custkey % 3 AS INT)
        |           WHEN 0 THEN upper(c_mktsegment)
        |           WHEN 1 THEN lower(c_mktsegment)
        |           ELSE substr(c_mktsegment, 1, 1)
        |                || lower(substr(c_mktsegment, 2, 100))
        |         END AS seg
        |  FROM customer)
        |SELECT lower(seg) AS seg_lc, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_variants
        |FROM v GROUP BY 1 ORDER BY seg_lc""".stripMargin)
}
