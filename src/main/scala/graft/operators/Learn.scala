package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned curation models trained INSIDE the engine — the step past
  * x161's static hashed classifier: corpus-curation pipelines routinely
  * fit small probes (a linear model over cheap per-doc statistics
  * standing in for an expensive labeler) and the fit itself must be a
  * distributed, deterministic dataflow or it becomes a driver-side
  * bottleneck at 100 TB.
  *
  * Two trainers, two plan shapes:
  *  - [[linearProbe]]: closed-form ordinary least squares via normal
  *    equations — ONE map-side-combined aggregate pass produces the ten
  *    sufficient statistics (exact DECIMAL sums), and the 3×3 Cramer
  *    solve is a constant-size expression on the 1-row result. The
  *    cheapest possible training plan: no iteration, no second scan.
  *  - [[perceptronGate]]: full-batch perceptron — `epochs` unrolled
  *    rounds of one filtered aggregate each (scan → misclassified-set
  *    sum → 1-row broadcast weight update), all arithmetic exact int64.
  *    The iterative template (x152/x156/x157/x162's fixed-point loop)
  *    applied to model fitting rather than graph propagation.
  *
  * Determinism contract: OLS sums are exact decimals cast to double
  * once, and the solve is a fixed expression tree evaluated identically
  * by DuckDB; the perceptron never leaves int64 (features are centered
  * by integer-div means, so the update direction is well-conditioned —
  * uncentered counts make full-batch updates oscillate).
  */
object Learn {

  /** Closed-form OLS of `y` on (1, `x1`, `x2`) plus R², via the normal
    * equations. Inputs must be integer-valued columns; the ten
    * sufficient statistics are summed as DECIMAL(38,0)-exact values
    * (each FACTOR is cast to DECIMAL(19,0) before the multiply, so the
    * per-row product is exact for any pair of int64 values — two
    * 19-digit factors fit the 38-digit product exactly; casting after
    * the int64 multiply would silently wrap past 2^63) and only the
    * solve runs in doubles. Exactness bound: the SUMS must fit 38
    * digits, i.e. any corpus up to ~10^19 rows of full-range int64
    * products. Output: 1 row — (n_docs, beta0, beta1, beta2, r2). */
  def linearProbe(df: DataFrame, y: Column, x1: Column, x2: Column)
      : DataFrame =
    solveOls(sufficientStats(df, y, x1, x2))

  /** Exact decimal sum of an int64 column, re-cast to DECIMAL(38,0)
    * AFTER the aggregate so the linear sums (s1/s2/sy) carry the same
    * 38-digit envelope as the product sums: Spark types
    * sum(decimal(19,0)) as decimal(29,0), which would both shrink the
    * documented overflow headroom by 9 digits and make the
    * sufficient-statistics parquet schema (ProbeStream's append-only
    * partials table) drift across versions — a resumed stream must
    * read old and new partials files under ONE inferred schema. The
    * post-aggregate cast is free (1 row) and lossless. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(19,0)")).cast("decimal(38,0)")

  /** Exact decimal sum of a product of two int64 columns — factors are
    * cast BEFORE the multiply (DECIMAL(19,0) × DECIMAL(19,0) →
    * DECIMAL(38,0), exact for every int64 pair); multiplying first in
    * int64 would wrap silently in Spark's non-ANSI mode while DuckDB
    * errors, a cross-engine divergence. */
  private def dprod(a: Column, b: Column): Column =
    sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)"))

  /** The ten OLS sufficient statistics of `y` on (1, `x1`, `x2`) as ONE
    * row of exact values (BIGINT count + DECIMAL(38,0) sums) — the
    * MERGEABLE form: statistics of a union are the column-wise sums of
    * per-part statistics, which is what lets [[solveOls]] refit from
    * accumulated per-batch partials (ProbeStream) without rescanning. */
  def sufficientStats(df: DataFrame, y: Column, x1: Column, x2: Column)
      : DataFrame =
    df.select(y.cast("long").as("y"), x1.cast("long").as("x1"),
        x2.cast("long").as("x2"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
        dprod(col("x1"), col("x1")).as("s11"),
        dprod(col("x1"), col("x2")).as("s12"),
        dprod(col("x2"), col("x2")).as("s22"),
        dsum(col("y")).as("sy"),
        dprod(col("x1"), col("y")).as("s1y"),
        dprod(col("x2"), col("y")).as("s2y"),
        dprod(col("y"), col("y")).as("syy"))

  /** DDL of [[sufficientStats]]'s output row — the PINNED read schema
    * for any append-only partials table (ProbeStream): decimal(38,0)
    * reads the pre-round-17 decimal(29,0) files losslessly (same
    * scale), so a stream resumed across the dsum widening merges old
    * and new partials under one schema instead of whatever file
    * inference happens to sample. */
  val statsDdl: String =
    "n BIGINT, s1 DECIMAL(38,0), s2 DECIMAL(38,0), s11 DECIMAL(38,0), " +
      "s12 DECIMAL(38,0), s22 DECIMAL(38,0), sy DECIMAL(38,0), " +
      "s1y DECIMAL(38,0), s2y DECIMAL(38,0), syy DECIMAL(38,0)"

  /** Re-add (merge) sufficient-statistics rows column-wise — the stats
    * of the union of the underlying parts. */
  def mergeStats(parts: DataFrame): DataFrame =
    parts.agg(
      sum(col("n")).cast("long").as("n"),
      sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
      sum(col("s11")).as("s11"), sum(col("s12")).as("s12"),
      sum(col("s22")).as("s22"), sum(col("sy")).as("sy"),
      sum(col("s1y")).as("s1y"), sum(col("s2y")).as("s2y"),
      sum(col("syy")).as("syy"))

  /** Cramer solve of the 3×3 normal equations from a
    * sufficient-statistics frame ([[sufficientStats]] shape, one fit
    * per row; `keys` columns pass through — the per-group form). Exact
    * sums are cast to double HERE, once; identical expression text runs
    * on the oracle side, so the doubles agree bit-for-bit. */
  def solveOls(stats: DataFrame, keys: Seq[String] = Nil): DataFrame = {
    val s = stats.selectExpr(keys ++ Seq(
      "CAST(n AS DOUBLE) AS n",
      "CAST(s1 AS DOUBLE) AS s1", "CAST(s2 AS DOUBLE) AS s2",
      "CAST(s11 AS DOUBLE) AS s11", "CAST(s12 AS DOUBLE) AS s12",
      "CAST(s22 AS DOUBLE) AS s22", "CAST(sy AS DOUBLE) AS sy",
      "CAST(s1y AS DOUBLE) AS s1y", "CAST(s2y AS DOUBLE) AS s2y",
      "CAST(syy AS DOUBLE) AS syy"): _*)
    s.selectExpr(
      "*",
      "n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det")
      .selectExpr(
        "*",
        "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)) / det AS b0",
        "(n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)) / det AS b1",
        "(n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)) / det AS b2")
      .selectExpr(keys ++ Seq(
        "CAST(n AS BIGINT) AS n_docs",
        "b0 AS beta0", "b1 AS beta1", "b2 AS beta2",
        "1 - (syy - b0*sy - b1*s1y - b2*s2y) / (syy - sy*sy/n) AS r2"): _*)
  }

  /** Closed-form RIDGE probe — [[linearProbe]] with an L2 penalty on
    * the two slope coefficients (intercept unpenalized, the standard
    * form): solve `(X'X + λ·diag(0,1,1)) β = X'y` with
    * `λ = lambdaPerRow · n`, so the regularization strength is
    * SCALE-INVARIANT — the same fraction of the per-row second moment
    * at any corpus size, where a fixed absolute λ would vanish at
    * 100 TB. Same single map-side-combined statistics pass as OLS; the
    * solve is the same constant-size Cramer expression with
    * `(s11+λ, s22+λ)` on the matrix diagonal.
    *
    * R² is computed from the RAW moments via the full quadratic
    * expansion `syy − 2β·m + βᵀGβ` (exact for ANY β — the OLS shortcut
    * `syy − β·m` relies on normal-equation orthogonality, which ridge
    * deliberately breaks). `lambdaPerRow = 0` reproduces
    * [[linearProbe]]'s betas bit-for-bit (identical solve up to `+0.0`
    * on non-negative diagonal sums); its R² agrees to float tolerance
    * (different but algebraically-equal association). LearnSpec pins
    * both, plus monotone slope shrinkage in λ. */
  def ridgeProbe(df: DataFrame, y: Column, x1: Column, x2: Column,
      lambdaPerRow: Long): DataFrame =
    solveRidge(sufficientStats(df, y, x1, x2), lambdaPerRow)

  /** The ridge solve on a sufficient-statistics frame
    * ([[sufficientStats]] shape) — separated from [[ridgeProbe]]
    * because the statistics are MODEL-AGNOSTIC: the same ten numbers
    * (and therefore the same accumulated partials table,
    * [[graft.streaming.ProbeStream]]) refit OLS and any-λ ridge
    * without touching the corpus again. */
  def solveRidge(stats: DataFrame, lambdaPerRow: Long): DataFrame = {
    require(lambdaPerRow >= 0, s"lambdaPerRow must be >= 0, got $lambdaPerRow")
    val s = stats.selectExpr(
      "CAST(n AS DOUBLE) AS n",
      "CAST(s1 AS DOUBLE) AS s1", "CAST(s2 AS DOUBLE) AS s2",
      "CAST(s11 AS DOUBLE) AS s11", "CAST(s12 AS DOUBLE) AS s12",
      "CAST(s22 AS DOUBLE) AS s22", "CAST(sy AS DOUBLE) AS sy",
      "CAST(s1y AS DOUBLE) AS s1y", "CAST(s2y AS DOUBLE) AS s2y",
      "CAST(syy AS DOUBLE) AS syy")
    s.selectExpr("*", s"CAST($lambdaPerRow AS DOUBLE) * n AS L")
      .selectExpr("*",
        "n*((s11+L)*(s22+L) - s12*s12) - s1*(s1*(s22+L) - s12*s2) + s2*(s1*s12 - (s11+L)*s2) AS det")
      .selectExpr("*",
        "(sy*((s11+L)*(s22+L) - s12*s12) - s1*(s1y*(s22+L) - s12*s2y) + s2*(s1y*s12 - (s11+L)*s2y)) / det AS b0",
        "(n*(s1y*(s22+L) - s2y*s12) - sy*(s1*(s22+L) - s12*s2) + s2*(s1*s2y - s1y*s2)) / det AS b1",
        "(n*((s11+L)*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - (s11+L)*s2)) / det AS b2")
      .selectExpr(
        "CAST(n AS BIGINT) AS n_docs",
        s"CAST($lambdaPerRow AS BIGINT) AS lambda_per_row",
        "b0 AS beta0", "b1 AS beta1", "b2 AS beta2",
        "1 - (syy - 2*(b0*sy + b1*s1y + b2*s2y) + " +
          "(b0*b0*n + b1*b1*s11 + b2*b2*s22 + 2*b0*b1*s1 + 2*b0*b2*s2 + 2*b1*b2*s12)) / " +
          "(syy - sy*sy/n) AS r2")
  }

  /** Per-group OLS — [[linearProbe]] with `key` as the grouping column:
    * the per-domain calibration form (one probe per source/language).
    * Same single map-side-combined pass — the sufficient statistics
    * aggregate simply gains a grouping key — then one constant-size
    * solve per group row. */
  def linearProbeBy(
      df: DataFrame, key: Column, y: Column, x1: Column, x2: Column)
      : DataFrame = {
    val stats = df
      .select(key.as("key"), y.cast("long").as("y"),
        x1.cast("long").as("x1"), x2.cast("long").as("x2"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
        dprod(col("x1"), col("x1")).as("s11"),
        dprod(col("x1"), col("x2")).as("s12"),
        dprod(col("x2"), col("x2")).as("s22"),
        dsum(col("y")).as("sy"),
        dprod(col("x1"), col("y")).as("s1y"),
        dprod(col("x2"), col("y")).as("s2y"),
        dprod(col("y"), col("y")).as("syy"))
    solveOls(stats, keys = Seq("key"))
  }

  /** Full-batch perceptron gate on features (1, `x1`, `x2`) with ±1
    * label `label`, `epochs` unrolled epochs, learning rate 1, exact
    * int64 throughout. Features are centered by their integer-div means
    * (one extra 1-row aggregate, broadcast) before training. Update per
    * epoch: `w += Σ_{i : y_i·(w·x_i) ≤ 0} y_i·x_i`. Output: 1 row —
    * (w0, w1, w2, n_total, n_correct, accuracy) where a row is correct
    * when `y·(w·x) > 0` under the final weights.
    *
    * Overflow bound (caller contract): after `E` epochs each weight is
    * ≤ E·Σ|x_c| and the margin products are ≤ max|x_c|·E·Σ|x_c| — keep
    * `E · Σ|x_c| · max|x_c| < 2^63` (at 10¹¹ docs of ≤10⁴-bounded
    * centered features and E≤4 this still holds with 10³ slack).
    *
    * NON-NEGATIVE-FEATURE contract: the centering means use integer
    * division, and Spark `div` TRUNCATES toward zero while the oracle's
    * DuckDB `//` FLOORS — identical only when `sum(x)` is non-negative.
    * Raw features here are counts (lengths, token counts), so the sums
    * are non-negative by construction; a caller feeding signed features
    * must pre-shift them, or the two engines disagree on the centers by
    * one. The same contract holds for the other integer-div laws in the
    * library ([[Corpus.waterfillAllocation]]'s budget split, [[Layout]]'s
    * grid quantization — both non-negative by construction). */
  def perceptronGate(
      df: DataFrame, label: Column, x1: Column, x2: Column,
      epochs: Int = 3): DataFrame = {
    val raw = df.select(
      label.cast("long").as("y"),
      x1.cast("long").as("r1"), x2.cast("long").as("r2"))
    val ctr = raw.agg(
      expr("sum(r1) div count(*)").as("__c1"),
      expr("sum(r2) div count(*)").as("__c2"))
    val f = raw.crossJoin(broadcast(ctr))
      .select(col("y"), lit(1L).as("x0"),
        (col("r1") - col("__c1")).as("x1"),
        (col("r2") - col("__c2")).as("x2"))
      .transform(graft.plans.Pin.pin)
    val zero = f.sparkSession.range(1)
      .select(lit(0L).as("a"), lit(0L).as("b"), lit(0L).as("c"))
    val w = (1 to epochs).foldLeft(zero) { (prev, _) =>
      val upd = f.crossJoin(broadcast(prev))
        .filter(col("y") * (col("a") * col("x0") + col("b") * col("x1") +
          col("c") * col("x2")) <= 0)
        .agg(sum(col("y") * col("x0")).as("da"),
          sum(col("y") * col("x1")).as("db"),
          sum(col("y") * col("x2")).as("dc"))
      prev.crossJoin(broadcast(upd)).select(
        (col("a") + coalesce(col("da"), lit(0L))).as("a"),
        (col("b") + coalesce(col("db"), lit(0L))).as("b"),
        (col("c") + coalesce(col("dc"), lit(0L))).as("c"))
    }
    f.crossJoin(broadcast(w))
      .groupBy(col("a"), col("b"), col("c"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("y") * (col("a") * col("x0") + col("b") * col("x1") +
          col("c") * col("x2")) > 0, 1L).otherwise(0L)).as("n_correct"))
      .select(
        col("a").as("w0"), col("b").as("w1"), col("c").as("w2"),
        col("n_total"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_total")).as("accuracy"))
  }

  /** K-fold cross-validation of the linear probe in ONE corpus scan —
    * the payoff of keeping sufficient statistics mergeable AND
    * subtractable: per fold f, the training statistics are
    * `total − stats(f)` (exact decimal subtraction, no second pass),
    * the solve is [[solveOls]] per fold row, and even the HOLDOUT error
    * needs no rescan — for a linear model,
    * `Σ_f (y − ŷ)² = syy − 2(b·[sy,s1y,s2y]) + bᵀ·G_f·b` where `G_f`
    * is the fold's own moment matrix, so MSE falls out of the same ten
    * numbers. One groupBy(fold) aggregate = the entire CV; at 100 TB
    * that is the cost of computing a histogram.
    *
    * Output per fold: (fold, n_train, n_test, beta0..2, mse,
    * r2_holdout), all doubles from the one shared expression tree (the
    * oracle runs the identical text). */
  def linearProbeCv(
      df: DataFrame, y: Column, x1: Column, x2: Column,
      foldOf: Column): DataFrame = {
    val names = Seq("n", "s1", "s2", "s11", "s12", "s22",
      "sy", "s1y", "s2y", "syy")
    val perFold = df
      .select(foldOf.cast("long").as("fold"), y.cast("long").as("y"),
        x1.cast("long").as("x1"), x2.cast("long").as("x2"))
      .groupBy(col("fold"))
      .agg(
        count(lit(1)).cast("decimal(28,0)").as("n"),
        dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
        dprod(col("x1"), col("x1")).as("s11"),
        dprod(col("x1"), col("x2")).as("s12"),
        dprod(col("x2"), col("x2")).as("s22"),
        dsum(col("y")).as("sy"),
        dprod(col("x1"), col("y")).as("s1y"),
        dprod(col("x2"), col("y")).as("s2y"),
        dprod(col("y"), col("y")).as("syy"))
    val totCols = names.map(c => sum(col(c)).as(s"t_$c"))
    val tot = perFold.agg(totCols.head, totCols.tail: _*)
    // train stats = total − fold stats (exact decimals), then the same
    // Cramer solve; holdout moments stay on the row for the MSE term
    val joined = perFold.crossJoin(broadcast(tot))
    val trained = solveOls(
      joined.select(
        col("fold").as("key") +:
          names.map(c => (col(s"t_$c") - col(c)).as(c)): _*),
      keys = Seq("key"))
    trained
      .join(perFold.withColumnRenamed("fold", "key"), Seq("key"))
      .selectExpr(
        "key AS fold", "n_docs AS n_train",
        "CAST(n AS BIGINT) AS n_test",
        "beta0", "beta1", "beta2",
        // Σ(y−ŷ)² / n_f, expanded in the fold's own moments
        "(CAST(syy AS DOUBLE) - 2*(beta0*CAST(sy AS DOUBLE) + beta1*CAST(s1y AS DOUBLE) + beta2*CAST(s2y AS DOUBLE)) + " +
          "(beta0*beta0*CAST(n AS DOUBLE) + beta1*beta1*CAST(s11 AS DOUBLE) + beta2*beta2*CAST(s22 AS DOUBLE) + " +
          "2*beta0*beta1*CAST(s1 AS DOUBLE) + 2*beta0*beta2*CAST(s2 AS DOUBLE) + 2*beta1*beta2*CAST(s12 AS DOUBLE))) / CAST(n AS DOUBLE) AS mse",
        "1 - ((CAST(syy AS DOUBLE) - 2*(beta0*CAST(sy AS DOUBLE) + beta1*CAST(s1y AS DOUBLE) + beta2*CAST(s2y AS DOUBLE)) + " +
          "(beta0*beta0*CAST(n AS DOUBLE) + beta1*beta1*CAST(s11 AS DOUBLE) + beta2*beta2*CAST(s22 AS DOUBLE) + " +
          "2*beta0*beta1*CAST(s1 AS DOUBLE) + 2*beta0*beta2*CAST(s2 AS DOUBLE) + 2*beta1*beta2*CAST(s12 AS DOUBLE)))) / " +
          "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS r2_holdout")
  }

  /** Logistic probe — fixed-iteration Newton/IRLS on (1, `x1`, `x2`)
    * with 0/1 label `label`: the classifier a real curation pipeline
    * actually trains for its quality gate (the fastText-style family
    * x161's scaladoc names), completing the trainer stack next to the
    * squared-loss probes (x197/x206), the perceptron (x198), and the
    * generative NB (x201/x204).
    *
    * Plan shape = the x198 template with Newton steps instead of
    * perceptron updates: integer-centered features pinned once, then
    * `iters` rounds of ONE map-side-combined aggregate each (the nine
    * weighted moments Σw, Σwx, ΣwxxT, Σr, Σrx) + a constant-size 3×3
    * Cramer solve broadcast back — β ← β + (XᵀWX)⁻¹Xᵀ(y−p) with
    * w = p(1−p). No driver-side data, no second scan per step.
    *
    * Portability contract (the x103 round-once discipline applied to
    * exp instead of ln): β is bit-identical cross-engine after every
    * step BECAUSE (a) per-row w and r are rounded ONCE to DECIMAL(9,6)
    * immediately after the only transcendental (`exp`), (b) all nine
    * moments are exact decimal sums of those rounded values times
    * integer features (order-free), and (c) the solve is one shared
    * expression text over the nine doubles ([[LogitText]] — the same
    * strings run in DuckDB), so every IEEE op replays in the same
    * order. The exp itself may differ by an ulp between libms — the
    * 6-dp rounding absorbs it except within ~1e-16 of a grid boundary,
    * the same accepted residual risk as every `round(ln(·), 4)` oracle
    * in the library. Overflow: |w| ≤ 0.25, |r| ≤ 1, features are
    * centered counts — the decimal moment sums hold to ~10³² rows.
    *
    * Output: 1 row — (n_docs, beta0, beta1, beta2, n_correct,
    * accuracy), prediction = (β·x ≥ 0), ties to the positive class in
    * both engines. */
  def logisticProbe(
      df: DataFrame, label: Column, x1: Column, x2: Column,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val raw = df.select(
      label.cast("long").as("y"),
      x1.cast("long").as("r1"), x2.cast("long").as("r2"))
    // integer-div centering — the x198 non-negative-feature contract
    // (Spark div truncates, DuckDB // floors; identical on
    // non-negative sums)
    val ctr = raw.agg(
      expr("sum(r1) div count(*)").as("__c1"),
      expr("sum(r2) div count(*)").as("__c2"))
    val f = raw.crossJoin(broadcast(ctr))
      .select(col("y"),
        (col("r1") - col("__c1")).as("x1"),
        (col("r2") - col("__c2")).as("x2"))
      .transform(graft.plans.Pin.pin)
    val zero = f.sparkSession.range(1).selectExpr(
      "CAST(0.0 AS DOUBLE) AS b0", "CAST(0.0 AS DOUBLE) AS b1",
      "CAST(0.0 AS DOUBLE) AS b2")
    val beta = (1 to iters).foldLeft(zero) { (prev, _) =>
      val p = LogitText.p(LogitText.t("b0", "b1", "b2"))
      val moments = f.crossJoin(broadcast(prev))
        .selectExpr(
          "y", "x1", "x2",
          s"${LogitText.w6(p)} AS w6", s"${LogitText.r6(p)} AS r6")
        .agg(expr(LogitText.aggs.head._2).as(LogitText.aggs.head._1),
          LogitText.aggs.tail.map { case (n, e) => expr(e).as(n) }: _*)
      prev.crossJoin(broadcast(moments))
        .selectExpr(s"${LogitText.det} AS det", "*")
        .selectExpr(
          s"b0 + ${LogitText.d0} AS b0",
          s"b1 + ${LogitText.d1} AS b1",
          s"b2 + ${LogitText.d2} AS b2")
    }
    val t = LogitText.t("b0", "b1", "b2")
    f.crossJoin(broadcast(beta))
      .groupBy(col("b0"), col("b1"), col("b2"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(expr(s"CASE WHEN (CASE WHEN $t >= 0 THEN 1 ELSE 0 END) = y " +
          "THEN 1 ELSE 0 END")).as("n_correct"))
      .select(
        col("n_docs"),
        col("b0").as("beta0"), col("b1").as("beta1"), col("b2").as("beta2"),
        col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs")).as("accuracy"))
  }

  /** ONE-SCAN logistic probe — [[logisticProbe]]'s scale path: because
    * the loss depends on the data only through the multiset of
    * (label, x1, x2) rows, and the features are small-domain integers,
    * the corpus collapses to a FEATURE HISTOGRAM (y, r1, r2, c) in one
    * map-side-combined pass; every IRLS iteration (and the final
    * confusion) then runs over the histogram's cells weighted by c —
    * at 100 TB the training cost is ONE corpus scan, and adding Newton
    * iterations is free (cells ≤ the product of the feature domains,
    * a broadcast-sized frame). The histogram is also the MERGEABLE
    * artifact ([[graft.streaming.LogitStream]]): histograms of a union
    * are cell-wise count sums, so a streamed refit is bit-identical to
    * the batch fit by construction.
    *
    * Same portable-text discipline as [[logisticProbe]]
    * ([[LogitText]]): per-cell w/r are rounded once onto the 1e-6
    * integer grid right after the exp, and the nine weighted moments
    * are exact DECIMAL(38,0) sums of int64 cell terms × counts
    * (|term| ≤ 0.25e6·max|x|² and c ≤ corpus rows — both fit 19
    * digits), divided by 1e6 once at the double cast. β may differ
    * from [[logisticProbe]]'s by final-ulp rounding-path differences
    * (one vs two double roundings per moment) — LearnSpec pins the
    * agreement; the registered query (x208) carries its own oracle.
    *
    * Caller contract: features must be small-domain integers (counts,
    * band ids); bucketize anything continuous first, or the histogram
    * is corpus-sized and the collapse buys nothing. */
  def logisticProbeHist(
      df: DataFrame, label: Column, x1: Column, x2: Column,
      iters: Int = 2): DataFrame =
    logisticFitFromHist(
      df.select(label.cast("long").as("y"),
          x1.cast("long").as("r1"), x2.cast("long").as("r2"))
        .groupBy(col("y"), col("r1"), col("r2"))
        .agg(count(lit(1)).as("c")),
      iters)

  /** IRLS fit from a (y, r1, r2, c) feature histogram — shared by the
    * batch path ([[logisticProbeHist]]) and the streaming refit
    * ([[graft.streaming.LogitStream]], merged per-batch partials).
    * Centering means derive from the histogram
    * (Σc·r ÷ Σc — exact int64, non-negative-feature contract as
    * [[perceptronGate]]); the histogram is pinned HERE so both paths
    * iterate over one materialized cell frame. */
  def logisticFitFromHist(hist0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val hist = hist0.transform(graft.plans.Pin.pin)
    val ctr = hist.agg(
      expr("sum(c * r1) div sum(c)").as("__c1"),
      expr("sum(c * r2) div sum(c)").as("__c2"))
    val f = hist.crossJoin(broadcast(ctr))
      .select(col("y"),
        (col("r1") - col("__c1")).as("x1"),
        (col("r2") - col("__c2")).as("x2"),
        col("c"))
    val zero = f.sparkSession.range(1).selectExpr(
      "CAST(0.0 AS DOUBLE) AS b0", "CAST(0.0 AS DOUBLE) AS b1",
      "CAST(0.0 AS DOUBLE) AS b2")
    val beta = (1 to iters).foldLeft(zero) { (prev, _) =>
      val p = LogitText.p(LogitText.t("b0", "b1", "b2"))
      val moments = f.crossJoin(broadcast(prev))
        .selectExpr(
          "y", "x1", "x2", "c",
          s"${LogitText.w6i(p)} AS w6i", s"${LogitText.r6i(p)} AS r6i")
        .agg(expr(LogitText.aggsW.head._2).as(LogitText.aggsW.head._1),
          LogitText.aggsW.tail.map { case (n, e) => expr(e).as(n) }: _*)
      prev.crossJoin(broadcast(moments))
        .selectExpr(s"${LogitText.det} AS det", "*")
        .selectExpr(
          s"b0 + ${LogitText.d0} AS b0",
          s"b1 + ${LogitText.d1} AS b1",
          s"b2 + ${LogitText.d2} AS b2")
    }
    val t = LogitText.t("b0", "b1", "b2")
    f.crossJoin(broadcast(beta))
      .groupBy(col("b0"), col("b1"), col("b2"))
      .agg(
        sum(col("c")).cast("long").as("n_docs"),
        sum(expr(s"CASE WHEN (CASE WHEN $t >= 0 THEN 1 ELSE 0 END) = y " +
          "THEN c ELSE 0 END")).cast("long").as("n_correct"))
      .select(
        col("n_docs"),
        col("b0").as("beta0"), col("b1").as("beta1"), col("b2").as("beta2"),
        col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs")).as("accuracy"))
  }

  /** Per-group one-scan logistic probes — [[logisticProbeHist]] with a
    * grouping key, the per-domain calibration form (one quality gate
    * per source/language — x199's per-source OLS pattern applied to
    * the classifier): the histogram gains the key, centering means are
    * PER GROUP (each domain's own feature distribution), and the IRLS
    * state becomes a groups-bounded β table that broadcasts into each
    * iteration's one map-side-combined moment aggregate. Still ONE
    * corpus scan total; per-iteration work is histogram-cells-sized.
    *
    * Degenerate groups (singular weighted normal equations — constant
    * features or a single cell) keep their previous β instead of going
    * NaN: the Newton delta is gated on det ≠ 0 ([[LogitText.dSafe]],
    * same text both engines), so a tiny source yields the zero model
    * (predict by intercept sign at β=0 → positive class) rather than
    * poisoning the output row. */
  def logisticProbeHistBy(
      df: DataFrame, key: Column, label: Column, x1: Column, x2: Column,
      iters: Int = 2): DataFrame =
    logisticFitFromHistBy(
      df.select(key.as("key"), label.cast("long").as("y"),
          x1.cast("long").as("r1"), x2.cast("long").as("r2"))
        .groupBy(col("key"), col("y"), col("r1"), col("r2"))
        .agg(count(lit(1)).as("c")),
      iters)

  /** Keyed IRLS fit from a (key, y, r1, r2, c) feature histogram — the
    * grouped twin of [[logisticFitFromHist]], shared by the batch path
    * ([[logisticProbeHistBy]]) and the streaming refit
    * ([[graft.streaming.GroupedLogitStream]], merged per-batch keyed
    * partials) so stream ≡ batch holds by construction. */
  def logisticFitFromHistBy(hist0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val (f, betas) = groupedIrls(hist0.transform(graft.plans.Pin.pin), iters)
    val t = LogitText.t("b0", "b1", "b2")
    f.join(broadcast(betas.select("key", "b0", "b1", "b2")), "key")
      .groupBy(col("key"), col("b0"), col("b1"), col("b2"))
      .agg(
        sum(col("c")).cast("long").as("n_docs"),
        sum(expr(s"CASE WHEN (CASE WHEN $t >= 0 THEN 1 ELSE 0 END) = y " +
          "THEN c ELSE 0 END")).cast("long").as("n_correct"))
      .select(
        col("key"), col("n_docs"),
        col("b0").as("beta0"), col("b1").as("beta1"), col("b2").as("beta2"),
        col("n_correct"),
        (col("n_correct").cast("double") / col("n_docs")).as("accuracy"))
  }

  /** The FROZEN per-source model artifact behind
    * [[logisticFitFromHistBy]]: (key, c1, c2, b0, b1, b2) — the
    * per-group integer centering means ALONGSIDE the betas, which is
    * what a serving gate needs to score raw features (the fit's
    * confusion output deliberately drops the centers; a gate cannot
    * re-derive them without the training histogram). Sources-bounded,
    * broadcast-able — the
    * [[graft.streaming.GroupedLogitServeStream]] input. */
  def logisticModelFromHistBy(hist0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val hist = hist0.transform(graft.plans.Pin.pin)
    groupedIrls(hist, iters)._2
      .select(col("key"), col("__c1").as("c1"), col("__c2").as("c2"),
        col("b0"), col("b1"), col("b2"))
  }

  /** Shared per-group IRLS core: returns (f, betasWithCenters) where
    * `f` is the per-group CENTERED weighted cell frame and the beta
    * table carries (key, __c1, __c2, b0, b1, b2). Exactly the
    * expression sequence the x209 oracle replays — both public wrappers
    * must stay bit-identical to it. */
  private def groupedIrls(hist: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    val ctr = hist.groupBy(col("key")).agg(
      expr("sum(c * r1) div sum(c)").as("__c1"),
      expr("sum(c * r2) div sum(c)").as("__c2"))
    val f = hist.join(broadcast(ctr), "key")
      .select(col("key"), col("y"),
        (col("r1") - col("__c1")).as("x1"),
        (col("r2") - col("__c2")).as("x2"),
        col("c"))
    val zero = f.select(col("key")).distinct().selectExpr(
      "key", "CAST(0.0 AS DOUBLE) AS b0", "CAST(0.0 AS DOUBLE) AS b1",
      "CAST(0.0 AS DOUBLE) AS b2")
    val betas = (1 to iters).foldLeft(zero) { (prev, _) =>
      val p = LogitText.p(LogitText.t("b0", "b1", "b2"))
      val m = f.join(broadcast(prev), "key")
        .selectExpr("key", "y", "x1", "x2", "c",
          s"${LogitText.w6i(p)} AS w6i", s"${LogitText.r6i(p)} AS r6i")
        .groupBy(col("key"))
        .agg(expr(LogitText.aggsW.head._2).as(LogitText.aggsW.head._1),
          LogitText.aggsW.tail.map { case (n, e) => expr(e).as(n) }: _*)
      m.join(prev, "key")
        .selectExpr(s"${LogitText.det} AS det", "*")
        .selectExpr("key",
          s"b0 + ${LogitText.dSafe(LogitText.d0)} AS b0",
          s"b1 + ${LogitText.dSafe(LogitText.d1)} AS b1",
          s"b2 + ${LogitText.dSafe(LogitText.d2)} AS b2")
    }
    (f, betas.join(broadcast(ctr), "key"))
  }

  /** Bernoulli naive Bayes gate — the GENERATIVE trainer completing the
    * family (x197 closed-form, x198 discriminative-iterative): train on
    * the even-`idCol` half (per-class word-presence counts, add-1
    * smoothed), score the odd half, report the confusion. One training
    * pass (distinct (doc, word) explode → (word, class) count — the
    * same shuffle shape as any inverted index) and one scoring pass.
    *
    * Exactness contract: every log is rounded ONCE to DECIMAL(12,6)
    * (the x103 `round(ln(·), k)` discipline), and the full-vocab
    * Bernoulli sum is rewritten as `prior_c + base_c + Σ_{w ∈ doc}
    * (log p_wc − log(1−p_wc))` where `base_c = Σ_vocab log(1−p_wc)` —
    * algebraically identical to summing over the whole vocabulary, but
    * the scoring join touches only each doc's PRESENT words, so the
    * plan is presence-join-sized, not vocab×docs-sized. All sums are
    * exact decimal; the class comparison (ties → negative class) is
    * therefore engine-independent. At web scale cap the vocabulary
    * first (the x41/x69 top-K pattern) — weights are a broadcast
    * frame either way. */
  def naiveBayesGate(
      df: DataFrame, idCol: String, textCol: String, label: Column)
      : DataFrame =
    nbGate(df, idCol, textCol, label, vocabK = 0)

  /** [[naiveBayesGate]] with the vocabulary capped to the top `vocabK`
    * training words by document frequency — the x41/x69 top-K pattern
    * the uncapped scaladoc names as the web-scale lever, shipped as its
    * own registered form (the x142/x179 demote-the-unbounded precedent):
    * at 100 TB the uncapped vocabulary is corpus-vocabulary-sized
    * (could outgrow a broadcast), while the capped weight table is
    * K·classes rows by construction — the cap itself is a TakeOrdered
    * (never a global sort) over the already-aggregated per-word counts.
    * Statistically this fits the Bernoulli model on the K most common
    * presence features; rarer words simply don't contribute to scores
    * (LearnSpec pins the accuracy cost on the fixture). */
  def naiveBayesGateCapped(
      df: DataFrame, idCol: String, textCol: String, label: Column,
      vocabK: Int): DataFrame = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    nbGate(df, idCol, textCol, label, vocabK)
  }

  private def nbGate(
      df: DataFrame, idCol: String, textCol: String, label: Column,
      vocabK: Int): DataFrame = {
    val d = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), label.cast("boolean").as("y"))
    val tr = d.filter(col("doc_id") % 2 === 0)
    val te = d.filter(col("doc_id") % 2 === 1)
    // r19 job-count diet (guide §1.2 step 1 — this family was nearly
    // pure scheduler floor, 1 task/stage at sf0.1): the truth column
    // rides the predict tail instead of a doc_id re-join against a
    // second test-corpus scan; n_train comes from the PINNED class-count
    // frame (Σ n ≡ count(tr) exactly — groupBy keeps every row in some
    // class group, NULL included); and vocab_size + n_train share ONE
    // broadcast. Each removed frame was a corpus re-scan plus its own
    // broadcast-build job.
    val (wt, classes, vocab, nc) = nbModelImplFull(tr, vocabK)
    val pred = nbPredictCarry(
      te.select(col("doc_id"), col("text"), col("y").as("truth")),
      Seq("truth"), wt, classes)
    pred.agg(
      sum(when(col("pred") && col("truth"), 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && !col("truth"), 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && !col("truth"), 1L).otherwise(0L)).as("tn"),
      sum(when(!col("pred") && col("truth"), 1L).otherwise(0L)).as("fn"),
      count(lit(1)).as("n_test"))
      .crossJoin(broadcast(
        vocab.agg(count(lit(1)).as("vocab_size"))
          .crossJoin(nc.agg(
            coalesce(sum(col("n")), lit(0L)).as("n_train")))))
      .select(col("n_train"), col("n_test"), col("vocab_size"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        ((col("tp") + col("tn")).cast("double") / col("n_test"))
          .as("accuracy"))
  }

  /** Train the Bernoulli NB model on a labeled frame (`doc_id`, `text`,
    * boolean `y`). Returns (weights, classes, vocab):
    * weights = (w, cls, lp, lq) — per (word, class) once-rounded
    * DECIMAL(12,6) log-likelihoods for presence/absence; classes =
    * (cls, pr, b) — per class, prior log-prob and the absent-word base
    * Σ log(1−p); vocab — the distinct training words. All three are
    * vocabulary/class-bounded, i.e. broadcastable.
    *
    * Materialization discipline: EVERY returned frame derives from a
    * `Pin.pin`'d vocabulary- or class-bounded frame (`nc`, `cnt`, the
    * weight table, the classes row pair), so the training corpus is
    * scanned exactly TWICE at fit time (once for the class counts,
    * once for the presence counts) and never again — a serving stream
    * ([[graft.streaming.NbServeStream]]) scores thousands of batches
    * against the frozen model with zero corpus rescans, and a
    * mid-stream change to the corpus's backing files cannot drift the
    * priors. The corpus-token-sized explode frame itself is NOT
    * pinned (round-15 pinned it and paid a corpus-sized checkpoint
    * for a frame read once): `vocab` derives from the pinned `cnt`
    * instead, which carries the same distinct words. */
  def nbModel(tr: DataFrame): (DataFrame, DataFrame, DataFrame) =
    nbModelImpl(tr, vocabK = 0)

  /** [[nbModel]] with the vocabulary capped to the top `vocabK` words
    * by training document frequency (ties → word asc — fully
    * deterministic). See [[naiveBayesGateCapped]]. */
  def nbModelCapped(tr: DataFrame, vocabK: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    nbModelImpl(tr, vocabK)
  }

  private def nbModelImpl(tr: DataFrame, vocabK: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val (wt, classes, vocab, _) = nbModelImplFull(tr, vocabK)
    (wt, classes, vocab)
  }

  /** [[nbModelImpl]] plus the PINNED class-count frame — [[nbGate]]
    * reads n_train from it (exact: Σ per-class counts = the training
    * row count) instead of re-scanning the training corpus. */
  private def nbModelImplFull(tr: DataFrame, vocabK: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val trw = tr
      .select(col("doc_id"), col("y"),
        explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("y"), col("w")).distinct()
    nbModelFromCountsFull(
      tr.groupBy(col("y")).agg(count(lit(1)).as("n")),
      trw.groupBy(col("w"), col("y")).agg(count(lit(1)).as("c")),
      vocabK)
  }

  /** Build the NB model from its SUFFICIENT STATISTICS — per-class doc
    * counts `(y, n)` and per-(word, class) presence counts `(w, y, c)`.
    * These counts are MERGEABLE (counts of a union = column-wise sums
    * of per-part counts, exact int64), which is what lets
    * [[graft.streaming.NbCappedStream]] accumulate per-batch partials
    * and refit the capped model without rescanning history — the
    * vocabulary cap is applied HERE, over the merged counts, so a
    * streamed refit is bit-identical to the batch fit over the
    * concatenated corpus (cap-then-merge would not be: a word can
    * enter the global top-K without being in any single batch's
    * top-K). Same weight/prior derivation as [[nbModel]]. */
  def nbModelFromCounts(nc0: DataFrame, cntAll0: DataFrame, vocabK: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val (wt, classes, vocab, _) = nbModelFromCountsFull(nc0, cntAll0, vocabK)
    (wt, classes, vocab)
  }

  /** [[nbModelFromCounts]] plus the pinned class-count frame `nc` —
    * internal callers ([[nbGate]] via [[nbModelImplFull]]) derive
    * n_train from it instead of re-scanning the training corpus. */
  private def nbModelFromCountsFull(
      nc0: DataFrame, cntAll0: DataFrame, vocabK: Int)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val nc = nc0.transform(graft.plans.Pin.pin)
    val cntAll = cntAll0.transform(graft.plans.Pin.pin)
    // the cap rides the PINNED vocab-sized counts — document frequency
    // is the class-sum of presence counts, the top-K is a TakeOrdered,
    // and the corpus is never rescanned for it
    val cnt =
      if (vocabK <= 0) cntAll
      else {
        val top = cntAll.groupBy(col("w")).agg(sum(col("c")).as("df"))
          .orderBy(col("df").desc, col("w").asc).limit(vocabK)
          .select(col("w"))
        cntAll.join(broadcast(top), Seq("w"))
      }
    val vocab = cnt.select(col("w")).distinct()
    // r19 grid shape (guide §2.4): classes are the rows of the PINNED
    // `nc` and `y` is BOOLEAN (the model's class contract), so the
    // (word × class) grid pivots the count frame by class in ONE
    // exchange on `w` and re-attaches (y, n) by broadcast — the old
    // vocab.distinct ⋈ (w, y) left join cost two more exchanges and,
    // uncapped, a corpus-vocabulary-sized shuffle join. The row set is
    // identical: stack emits both class slots per word and the INNER
    // broadcast join on y keeps exactly the classes present in nc (a
    // single-class corpus gets one row per word, as before); a missing
    // (w, y) count coalesces to 0 exactly as the old left join did.
    val byW = cnt.groupBy(col("w")).agg(
      max(when(col("y") === true, col("c"))).as("c_t"),
      max(when(col("y") === false, col("c"))).as("c_f"))
    val grid = byW
      .selectExpr("w", "stack(2, true, c_t, false, c_f) AS (y, c0)")
      .join(broadcast(nc), Seq("y"))
      .select(col("w"), col("y"), coalesce(col("c0"), lit(0L)).as("c"), col("n"))
    val wt = grid.selectExpr("w", "y AS cls",
      "CAST(round(ln(CAST(c + 1 AS DOUBLE) / (n + 2)), 6) AS DECIMAL(12,6)) AS lp",
      "CAST(round(ln(1 - CAST(c + 1 AS DOUBLE) / (n + 2)), 6) AS DECIMAL(12,6)) AS lq")
      .transform(graft.plans.Pin.pin)
    val base = wt.groupBy(col("cls")).agg(sum(col("lq")).as("b"))
    val total = nc.agg(sum(col("n")).as("nt"))
    val prior = nc.crossJoin(broadcast(total)).selectExpr("y AS cls",
      "CAST(round(ln(CAST(n AS DOUBLE) / nt), 6) AS DECIMAL(12,6)) AS pr")
    val classes = prior.join(base, "cls").transform(graft.plans.Pin.pin)
    (wt, classes, vocab, nc)
  }

  /** Score (`doc_id`, `text`) rows against a frozen NB model and return
    * (doc_id, pred): pred = positive-class score strictly greater
    * (ties → negative). The full-vocab Bernoulli sum is evaluated via
    * the absent-word-base rewrite, so the scoring join touches only
    * each doc's PRESENT words with the weight table broadcast. Exact
    * decimal arithmetic throughout — batch and streaming callers get
    * identical verdicts by construction.
    *
    * Degenerate-model guard: if the training corpus carried only ONE
    * class, one side of the score comparison has no rows and would be
    * NULL — a NULL `pred` matches neither `=== keep` nor `=!= keep`
    * downstream, silently vanishing docs from both kept output and
    * metrics. The comparison therefore coalesces to the only class
    * present: positive-only model → every doc predicts true,
    * negative-only → false. With both classes present (every real
    * corpus) the coalesce is never reached and the verdict is the
    * plain strict comparison the oracle replays. */
  def nbPredict(docs: DataFrame, wt: DataFrame, classes: DataFrame)
      : DataFrame =
    nbPredictCarry(docs, Nil, wt, classes)

  /** [[nbPredict]] with constant-per-doc passthrough columns: each name
    * in `carry` must exist on `docs` and be constant within a doc_id
    * (it rides the per-class fan-out and is re-collapsed with `max`,
    * exact for a constant). Lets [[nbGate]] keep the truth label on the
    * scored rows instead of re-scanning the test corpus for a doc_id
    * re-join — one fewer scan, exchange and join in the gate plan. */
  private[operators] def nbPredictCarry(
      docs: DataFrame, carry: Seq[String], wt: DataFrame,
      classes: DataFrame): DataFrame = {
    val dw = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    val sc = dw.join(broadcast(wt), Seq("w"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("lp") - col("lq")).as("s"))
    docs.select(col("doc_id") +: carry.map(col): _*)
      .crossJoin(broadcast(classes))
      .join(sc, Seq("doc_id", "cls"), "left")
      .select(col("doc_id") +: col("cls") +:
        (col("pr") + col("b") + coalesce(col("s"), lit(0))
          .cast("decimal(22,6)")).as("score") +: carry.map(col): _*)
      .groupBy(col("doc_id"))
      .agg(
        coalesce(
          max(when(col("cls"), col("score"))) >
            max(when(!col("cls"), col("score"))),
          max(when(col("cls"), col("score"))).isNotNull).as("pred"),
        carry.map(c => max(col(c)).as(c)): _*)
  }
}

/** The shared SQL text of [[Learn.logisticProbe]]'s per-row laws,
  * weighted moments, and Newton solve — one set of strings evaluated by
  * BOTH engines (Spark via selectExpr/expr, DuckDB via the x207 oracle
  * CTEs), so every double-precision operation replays in the same
  * order and β stays bit-identical cross-engine. Column-name contract:
  * the feature frame exposes integer `y` (0/1), `x1`, `x2`; the moment
  * row exposes sw/sw1/sw2/sw11/sw12/sw22/sr/sr1/sr2 (+ det). The solve
  * strings are [[Learn.solveOls]]'s Cramer text with the substitution
  * n→sw, s1→sw1, s2→sw2, s11→sw11, s12→sw12, s22→sw22, sy→sr,
  * s1y→sr1, s2y→sr2 — the weighted normal equations. */
private[graft] object LogitText {
  /** linear score at scalar coefficients (textual names or literals) */
  def t(b0: String, b1: String, b2: String): String =
    s"$b0 + $b1*CAST(x1 AS DOUBLE) + $b2*CAST(x2 AS DOUBLE)"
  /** sigmoid — the library's only exp; rounded immediately below */
  def p(t: String): String = s"1.0/(1.0 + exp(-($t)))"
  /** IRLS weight p(1−p), rounded ONCE to the portable 6-dp grid */
  def w6(p: String): String =
    s"CAST(round(($p)*(1.0-($p)), 6) AS DECIMAL(9,6))"
  /** residual y−p on the same grid */
  def r6(p: String): String =
    s"CAST(round(CAST(y AS DOUBLE) - ($p), 6) AS DECIMAL(9,6))"
  /** the nine weighted moments as exact decimal sums (rounded decimal ×
    * integer features — order-free), cast to double once */
  val aggs: Seq[(String, String)] = {
    def xd(c: String) = s"CAST($c AS DECIMAL(12,0))"
    Seq(
      "sw" -> "CAST(SUM(w6) AS DOUBLE)",
      "sw1" -> s"CAST(SUM(w6*${xd("x1")}) AS DOUBLE)",
      "sw2" -> s"CAST(SUM(w6*${xd("x2")}) AS DOUBLE)",
      "sw11" -> s"CAST(SUM(w6*${xd("x1")}*${xd("x1")}) AS DOUBLE)",
      "sw12" -> s"CAST(SUM(w6*${xd("x1")}*${xd("x2")}) AS DOUBLE)",
      "sw22" -> s"CAST(SUM(w6*${xd("x2")}*${xd("x2")}) AS DOUBLE)",
      "sr" -> "CAST(SUM(r6) AS DOUBLE)",
      "sr1" -> s"CAST(SUM(r6*${xd("x1")}) AS DOUBLE)",
      "sr2" -> s"CAST(SUM(r6*${xd("x2")}) AS DOUBLE)")
  }
  /** integer-grid twins of [[w6]]/[[r6]] for the HISTOGRAM form: the
    * same 1e-6 grid as micro-units in int64, so weighted moments can
    * run as exact DECIMAL(38,0) sums of (int64 cell term) × (count) */
  def w6i(p: String): String =
    s"CAST(round(($p)*(1.0-($p)) * 1000000.0) AS BIGINT)"
  def r6i(p: String): String =
    s"CAST(round((CAST(y AS DOUBLE) - ($p)) * 1000000.0) AS BIGINT)"
  /** the nine weighted moments over histogram cells: per-cell int64
    * term (micro-units × integer features; |term| ≤ 0.25e6·max|x|² —
    * 19 digits) × DECIMAL(19,0) count, summed exactly, one /1e6 at the
    * double cast. DECIMAL(19,0)×DECIMAL(19,0) is 38-wide in BOTH
    * engines (Spark caps p1+p2+1=39 at 38; DuckDB uses w1+w2=38). */
  val aggsW: Seq[(String, String)] = {
    def m(term: String) =
      s"CAST(SUM(CAST($term AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS DOUBLE) / 1000000.0"
    Seq(
      "sw" -> m("w6i"),
      "sw1" -> m("w6i*x1"),
      "sw2" -> m("w6i*x2"),
      "sw11" -> m("w6i*x1*x1"),
      "sw12" -> m("w6i*x1*x2"),
      "sw22" -> m("w6i*x2*x2"),
      "sr" -> m("r6i"),
      "sr1" -> m("r6i*x1"),
      "sr2" -> m("r6i*x2"))
  }
  /** det-gated Newton delta for the GROUPED form: a degenerate group
    * (singular weighted normal equations) keeps its previous β instead
    * of propagating NaN across engines. CASE chooses, never errors —
    * double division by zero is Inf/NaN in both engines, and the
    * unselected branch's value is discarded identically. */
  def dSafe(d: String): String = s"(CASE WHEN det = 0.0 THEN 0.0 ELSE $d END)"
  val det: String =
    "sw*(sw11*sw22 - sw12*sw12) - sw1*(sw1*sw22 - sw12*sw2) + sw2*(sw1*sw12 - sw11*sw2)"
  val d0: String =
    "(sr*(sw11*sw22 - sw12*sw12) - sw1*(sr1*sw22 - sw12*sr2) + sw2*(sr1*sw12 - sw11*sr2)) / det"
  val d1: String =
    "(sw*(sr1*sw22 - sr2*sw12) - sr*(sw1*sw22 - sw12*sw2) + sw2*(sw1*sr2 - sr1*sw2)) / det"
  val d2: String =
    "(sw*(sw11*sr2 - sw12*sr1) - sw1*(sw1*sr2 - sr1*sw2) + sr*(sw1*sw12 - sw11*sw2)) / det"
}
