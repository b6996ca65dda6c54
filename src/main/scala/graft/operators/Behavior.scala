package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Behavioral / sequence analytics over an event log: funnel
  * conversion, cohort retention, transition (Markov) counts, and
  * time-series linear interpolation.
  *
  * These are the event-log counterparts of the reference's
  * collection operators (grouping + window reductions,
  * `blaze/expr/collections.py`, `blaze/expr/reductions.py`) applied to
  * the sessionization family (see [[Sessionize]]); none exist as
  * first-class reference operators, but they are the queries a
  * training-data/telemetry pipeline runs daily.
  *
  * Scale notes, uniform across the family: every operator shuffles
  * once on the entity key (`user`) and reuses that single Exchange
  * across its chained window passes (same partitioning → Spark plans
  * one shuffle). No driver-side collection, no global windows; output
  * is either per-entity (bounded by users) or a small aggregate.
  */
object Behavior {

  /** Ordered-funnel conversion: for each step i > 1, the step-i
    * timestamp is the user's earliest `steps(i)` event STRICTLY AFTER
    * their step-(i-1) timestamp (the classic "unordered counts lie"
    * fix — a purchase before the first view does not convert).
    *
    * Returns one row: `step_1 … step_n` = distinct users reaching each
    * step. Chained `min(when(...)).over(user)` windows — one shuffle,
    * n window passes over the same partitioning, then a tiny
    * all-column aggregate.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             typeCol: String = "event_type", tsCol: String = "ts",
             userCol: String = "user_id"): DataFrame = {
    require(steps.size >= 2, s"funnel: need >= 2 steps, got ${steps.size}")
    val w = Window.partitionBy(userCol)
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t_${i - 1}")
      df.withColumn(s"t_$i", min(when(cond, col(tsCol))).over(w))
    }
    val aggs = steps.indices.map(i =>
      countDistinct(when(col(s"t_$i").isNotNull, col(userCol)))
        .as(s"step_${i + 1}"))
    withTs.agg(aggs.head, aggs.tail: _*)
  }

  /** [[funnel]] with a CONVERSION WINDOW — the product-analytics
    * default: later steps only count when they land within
    * `windowSeconds` of the user's FIRST step-1 event (the anchor).
    * Greedy first-anchor semantics, deliberately: a funnel completed
    * only from a LATER step-1 instance does not count, exactly as
    * first-touch funnel reports define it (documented, not a bug).
    * Window arithmetic is exact int64 microseconds. Same plan shape
    * as [[funnel]]: chained conditional mins over ONE user-partitioned
    * window (single shuffle), one global count row out.
    */
  def funnelWindowed(events: DataFrame, steps: Seq[String], windowSeconds: Long,
                     typeCol: String = "event_type", tsCol: String = "ts",
                     userCol: String = "user_id"): DataFrame = {
    require(steps.size >= 2, s"funnelWindowed: need >= 2 steps, got ${steps.size}")
    require(windowSeconds > 0, s"funnelWindowed: windowSeconds > 0, got $windowSeconds")
    val w = Window.partitionBy(userCol)
    val withTs = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t_${i - 1}") &&
          unix_micros(col(tsCol)) <= unix_micros(col("t_0")) + windowSeconds * 1000000L
      df.withColumn(s"t_$i", min(when(cond, col(tsCol))).over(w))
    }
    val aggs = steps.indices.map(i =>
      countDistinct(when(col(s"t_$i").isNotNull, col(userCol)))
        .as(s"step_${i + 1}"))
    withTs.agg(aggs.head, aggs.tail: _*)
  }

  /** First/last-touch attribution: for every conversion event, the
    * earliest and latest touch-type event STRICTLY BEFORE it in the
    * same user's history (the two classic single-touch attribution
    * models; a conversion with no preceding touch attributes to NULL —
    * "direct"). One user-partitioned window, ordered by (ts, idCol)
    * for a total order under timestamp ties — no self-join, no
    * per-conversion re-scan; high-cardinality user partitions, never a
    * global window.
    */
  def attribution(events: DataFrame, conversionType: String,
                  touchTypes: Seq[String], typeCol: String = "event_type",
                  tsCol: String = "ts", userCol: String = "user_id",
                  idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: need at least one touch type")
    require(!touchTypes.contains(conversionType),
      s"attribution: conversion '$conversionType' cannot also be a touch type")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes.map(x => x: Any): _*), col(typeCol))
    events
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(col(idCol), col(userCol), col(tsCol),
        col("first_touch"), col("last_touch"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of
    * the user's first event; for each (cohort_week, week_offset) the
    * number of distinct users from that cohort active in that week.
    * Offsets are exact multiples of 7 days, so the day-diff / 7
    * division is integral (no floating slop).
    */
  def retention(events: DataFrame, tsCol: String = "ts",
                userCol: String = "user_id"): DataFrame = {
    val wk = date_trunc("week", col(tsCol))
    val withCohort = events
      .withColumn("active_week", wk)
      .withColumn("cohort_week",
        min(col("active_week")).over(Window.partitionBy(userCol)))
    withCohort
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
  }

  /** First-order transition counts (empirical Markov chain): per user,
    * order events by (ts, id) and count (previous type → type) pairs.
    * The id tiebreak makes the lag deterministic under equal
    * timestamps. One shuffle on user; output is |types|² rows.
    */
  def transitions(events: DataFrame, typeCol: String = "event_type",
                  tsCol: String = "ts", idCol: String = "event_id",
                  userCol: String = "user_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("transitions"))
  }

  /** Stationary distribution of the behavior Markov chain — the
    * long-run state occupancy [[transitions]]' counts imply, by
    * `iters` integer-scaled power iterations (the
    * [[graft.operators.Graph.pagerank]] determinism recipe without
    * damping): `π'(j) = Σ_i ⌊π(i)·cnt(i→j)/out(i)⌋`, every
    * intermediate exact int64 (`π·cnt < 2^53` for the default scale
    * and corpus-sized counts — the floor-of-double IS integer
    * division), so the whole iteration replays bit-identically and the
    * oracle unrolls it in SQL. Absorbing states (no outgoing
    * transitions) accumulate and re-emit nothing — mass leaks there
    * and on every floor, deliberately: this is a RANKING of states,
    * not a calibrated probability (normalize the output if one is
    * needed).
    *
    * Scale shape: states can be high-cardinality (page URLs, not just
    * event types) — each round is one join of the transition table
    * against the |states| vector + one aggregate, the pagerank shape;
    * for few `iters` the growing lineage is fine, checkpoint beyond
    * ~10 rounds as the pagerank loop does.
    */
  def stationaryDist(trans: DataFrame, iters: Int,
                     scale: Long = 1000000L): DataFrame = {
    require(iters > 0 && scale > 0,
      s"stationaryDist: iters and scale must be positive, got $iters, $scale")
    val rowsum = trans.groupBy(col("prev_type")).agg(sum(col("transitions")).as("_out"))
    val t2 = trans.join(rowsum, "prev_type")
    val states = trans.select(col("prev_type").as("state"))
      .union(trans.select(col("next_type"))).distinct()
    var pi = states.select(col("state"), lit(scale).as("pi"))
    for (_ <- 1 to iters) {
      val contrib = t2.join(pi, t2("prev_type") === pi("state"))
        .select(col("next_type").as("_st"),
          floor((col("pi") * col("transitions")).cast(DoubleType) /
            col("_out").cast(DoubleType)).cast(LongType).as("_c"))
        .groupBy(col("_st")).agg(sum(col("_c")).as("_s"))
      pi = states.join(contrib, states("state") === contrib("_st"), "left")
        .select(col("state"), coalesce(col("_s"), lit(0L)).as("pi"))
    }
    pi
  }

  /** Most frequent k-step event paths (order-preserving n-gram mining
    * over each user's event-time sequence) — the path-analysis staple
    * ("view → click → purchase happens N times"). One window pass
    * builds the k-grams via `lead` (no self-joins), one count
    * aggregate ranks them; `topN` rides TakeOrdered. Ties break on the
    * path string, so the ranking is total and engine-exact.
    *
    * NULL event types are dropped BEFORE the k-grams are built (a
    * NULL step is not a path step): `concat_ws` would silently skip a
    * NULL mid-gram and produce a shortened path, while SQL `||`
    * concatenation nulls the whole gram — filtering first gives every
    * engine the same sequence domain.
    */
  def topPaths(events: DataFrame, k: Int, topN: Int,
               typeCol: String = "event_type", tsCol: String = "ts",
               idCol: String = "event_id", userCol: String = "user_id"): DataFrame = {
    require(k >= 2 && k <= 8, s"topPaths: k in [2,8], got $k")
    require(topN >= 1, s"topPaths: topN must be positive, got $topN")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val steps = (0 until k).map {
      case 0 => col(typeCol)
      case i => lead(col(typeCol), i).over(w)
    }
    events
      .filter(col(typeCol).isNotNull)
      .select(concat_ws(">", steps: _*).as("path"), steps.last.isNotNull.as("_full"))
      .filter(col("_full")) // k-grams truncated by the sequence end drop out
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path"))
      .limit(topN)
  }

  /** OHLC resampling: downsample a per-entity metric stream to
    * open/high/low/close/volume bars per time bucket — the standard
    * metric-compaction step before charting or coarse modeling. Open
    * and close are argmin/argmax over the TOTAL (ts, id) order, so
    * bars are deterministic even with equal timestamps; values pass
    * through untouched (no float arithmetic to diverge), and the
    * exact-decimal `vsum` makes the volume-weighted reading exact.
    * Output: `(bucket, open, high, low, close, volume, vsum)`.
    *
    * Scale shape: ONE aggregate keyed by the bucket — min_by/max_by
    * carry a (value, ord) pair per partial state, so the whole bar
    * computes map-side with one bucket-count-sized shuffle; no window,
    * no per-bucket sort.
    */
  def resampleOhlc(events: DataFrame, bucket: Column,
                   valueCol: String = "value", tsCol: String = "ts",
                   idCol: String = "event_id"): DataFrame = {
    val ord = struct(col(tsCol), col(idCol))
    events
      .groupBy(bucket.as("bucket"))
      .agg(min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("volume"),
        // house quantization rule (same recipe as cusum): half-up centi
        // quantization floor(v·100 + 0.5) summed as long, ONE final IEEE
        // division — not a double→DECIMAL(18,2) cast, whose half-cent
        // rounding is engine-divergent (shortest-representation vs
        // binary-value rounding)
        (sum(floor(col(valueCol).cast(DoubleType) * 100 + lit(0.5))
          .cast(LongType)).cast(DoubleType) / lit(100.0)).as("vsum"))
      .orderBy("bucket")
  }

  /** Seasonal-naive decomposition of a metric: the seasonal component
    * is the mean at each position of the cycle (`periodKey`, e.g.
    * hour-of-day), the residual is what's left — the baseline
    * anomaly-contextualizer (is this spike real, or just 9am?).
    * Means are exact decimal sums over 2-decimal metrics divided once
    * in double, so seasonal and residual replay bit-identically
    * cross-engine. Output: input columns + `seasonal`, `residual`.
    *
    * Scale shape: one period-bounded aggregate (|periods| rows,
    * e.g. 24) broadcast back into a map-side join — the raw stream is
    * scanned once and never shuffled.
    */
  def seasonalDecompose(events: DataFrame, valueCol: String,
                        periodKey: Column, keyName: String = "period"): DataFrame = {
    val D = DecimalType(18, 2)
    val withK = events.withColumn("_pk", periodKey)
    val means = withK.groupBy(col("_pk"))
      .agg((sum(col(valueCol).cast(D)).cast(DoubleType) /
        count(lit(1))).as("seasonal"))
    withK.join(broadcast(means), "_pk")
      .withColumn("residual", col(valueCol) - col("seasonal"))
      .withColumnRenamed("_pk", keyName)
  }

  /** Linear interpolation of missing values in a per-entity time
    * series: for each row where `valueCol` is NULL, interpolate
    * between the nearest non-null neighbours (ordered by ts, id):
    *
    *   v = prev + (next - prev) * (t - t_prev) / (t_next - t_prev)
    *
    * Edge rows with only one neighbour take that neighbour
    * (forward/backward fill); rows with a present value keep it.
    * Time arithmetic is exact int64 microseconds; only the final
    * fraction is IEEE double. Two window passes (backward + forward)
    * over one user shuffle.
    */
  def interpolate(events: DataFrame, valueCol: String,
                  tsCol: String = "ts", idCol: String = "event_id",
                  userCol: String = "user_id"): DataFrame = {
    val asc = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us = unix_micros(col(tsCol))
    val vOrNull = col(valueCol)
    val tOrNull = when(vOrNull.isNotNull, us)
    val prevV = last(vOrNull, ignoreNulls = true).over(asc)
    val prevT = last(tOrNull, ignoreNulls = true).over(asc)
    val nextV = first(vOrNull, ignoreNulls = true).over(desc)
    val nextT = first(tOrNull, ignoreNulls = true).over(desc)
    val frac = (us - col("p_t")).cast("double") /
      (col("n_t") - col("p_t")).cast("double")
    events
      .withColumn("p_v", prevV).withColumn("p_t", prevT)
      .withColumn("n_v", nextV).withColumn("n_t", nextT)
      .withColumn(valueCol,
        when(vOrNull.isNotNull, vOrNull)
          .when(col("p_v").isNotNull && col("n_v").isNotNull,
            col("p_v") + (col("n_v") - col("p_v")) * frac)
          .otherwise(coalesce(col("p_v"), col("n_v"))))
      .drop("p_v", "p_t", "n_v", "n_t")
  }

  /** Per-key interval union: merge overlapping or touching intervals
    * (`[start, end)`, touching = next start == running max end) into
    * maximal "islands" and return one row per island with its span.
    * The classic gaps-and-islands formulation: order each key's
    * intervals by (start, end), an interval OPENS a new island iff its
    * start exceeds the running max end over all strictly preceding
    * intervals; the island id is the running sum of open flags. All
    * time arithmetic is exact int64 microseconds — no IEEE step, so
    * the result is bit-identical across engines and partitionings.
    *
    * Scale shape: two windows over the SAME key partitioning (running
    * max, then running sum) + one (key, island) aggregate — one
    * shuffle on the key, co-partitioned throughout; high-cardinality
    * key partitions, never a global window.
    *
    * Distinct from [[graft.operators.Sessionize]]: sessions split on
    * event GAPS from point timestamps; this merges explicit DURATIONS
    * (crawl visit windows, lease/validity ranges, ad exposure spans).
    */
  def mergeIntervals(intervals: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val s = unix_micros(col(startCol))
    val e = unix_micros(col(endCol))
    val order = Window.partitionBy(keyCol).orderBy(s, e)
    val prevMaxEnd = max(e).over(order.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMaxEnd.isNull || s > prevMaxEnd, 1L).otherwise(0L)
    intervals
      .withColumn("_open", opens)
      .withColumn("_island",
        sum(col("_open")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(s).as("island_start_us"), max(e).as("island_end_us"),
        count(lit(1)).as("n_merged"))
      .select(col(keyCol), col("_island").as("island"),
        col("island_start_us"), col("island_end_us"), col("n_merged"),
        (col("island_end_us") - col("island_start_us")).as("covered_us"))
  }

  /** Per-key coverage summary over the merged islands of
    * [[mergeIntervals]]: number of maximal intervals and total covered
    * microseconds (overlaps counted once). One extra key-local
    * aggregate on top of the island table. */
  def intervalCoverage(intervals: DataFrame, keyCol: String,
                       startCol: String, endCol: String): DataFrame =
    mergeIntervals(intervals, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"), sum(col("covered_us")).as("covered_us"))

  /** Per-key exponentially-weighted moving average, final value — the
    * recursive smoother `y_t = α·x_t + (1−α)·y_{t−1}` (y_0 = x_0) a
    * telemetry pipeline keeps per entity. The recursion is inherently
    * sequential, so it is evaluated as a chronological LEFT FOLD over
    * each key's own events (`collect_list` + the `aggregate` HOF) —
    * per-key state is bounded by that key's event count, keys fold in
    * parallel, one shuffle total; there is deliberately NO window
    * formulation (the closed form needs `(1−α)^(−i)` terms that
    * overflow for long series).
    *
    * α is a RATIONAL `aNum/aDen`, and each step is computed as
    * `(aNum·x + (aDen−aNum)·acc) / aDen` — integer coefficients, one
    * IEEE division per step, identical association order on any
    * engine, so the result replays bit-exactly (a float `1−α` would
    * already disagree across engines: `1−0.2` and literal `0.8` are
    * different doubles). Ties on the timestamp order by value
    * (sort_array on the (ts, value) struct) — deterministic.
    */
  def ewmaLast(events: DataFrame, aNum: Long, aDen: Long,
               keyCol: String = "user_id", tsCol: String = "ts",
               valueCol: String = "value"): DataFrame = {
    require(0 < aNum && aNum <= aDen,
      s"ewmaLast: alpha must be a rational in (0, 1]: $aNum/$aDen")
    val pair = struct(col(tsCol), col(valueCol).cast("double").as("v"))
    events.groupBy(col(keyCol))
      .agg(sort_array(collect_list(pair)).as("_a"), count(lit(1)).as("n_events"))
      .select(col(keyCol), col("n_events"),
        aggregate(
          slice(col("_a"), lit(2), size(col("_a")) - 1),
          element_at(col("_a"), 1).getField("v"),
          (acc, e) => (lit(aNum) * e.getField("v") + lit(aDen - aNum) * acc) / lit(aDen))
          .as("ewma"))
  }

  /** One-sided CUSUM control chart per entity — sequential changepoint
    * detection ("this key's metric has drifted up"): with centi-unit
    * integer values, reference `k` and threshold `h` (both centi),
    * the classic recursion `S_t = max(0, S_{t−1} + (x_t − k))` is
    * computed WITHOUT a stateful fold via the prefix-min identity
    * `S_t = P_t − min_{j≤t} P_j` where `P_t = Σ_{i≤t}(x_i − k)` —
    * two running windows over one shuffle, all int64-exact, so alarms
    * replay bit-identically on any engine. Output: input keys +
    * `(event_id, cusum_c, alarm)` with `alarm = S_t > h`.
    *
    * Magnitude: |x−k| ≤ 2·10⁷ centi over ≤ 2^35 events per key stays
    * inside int64 — the practical bound is never the issue the float
    * CUSUM's accumulated rounding is.
    *
    * Centi quantization is `floor(value·100 + 0.5)` — two IEEE double
    * ops plus a floor, bit-identical on every engine. (A
    * double→DECIMAL(18,2) cast is NOT: it rounds the decimal
    * shortest-representation in some engines and the binary value in
    * others, so half-cent inputs like 1.005 diverge across builds.)
    *
    * Scale shape: one window partitioned by the entity key; no fold
    * state, no collect_list — this is the streaming-friendly batch
    * face (the stateful stream face would carry one long per key).
    */
  def cusum(events: DataFrame, kCenti: Long, hCenti: Long,
            keyCol: String = "user_id", tsCol: String = "ts",
            idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(hCenti > 0, s"cusum: threshold must be positive, got $hCenti")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step =
      floor(col(valueCol).cast("double") * 100d + 0.5d).cast(LongType) - kCenti
    events
      .withColumn("_p", sum(step).over(w))
      .withColumn("_pmin", min(least(col("_p"), lit(0L))).over(w))
      .withColumn("cusum_c", col("_p") - col("_pmin"))
      .withColumn("alarm", col("cusum_c") > hCenti)
      .drop("_p", "_pmin")
  }

  /** Holt double-exponential (level + trend) smoothing to the last
    * state per key — [[ewmaLast]]'s sibling for trending metrics (an
    * EWMA lags a ramp forever; the trend state doesn't). Standard
    * init `l₁ = x₁, b₁ = x₂ − x₁`, then per step
    * `l' = (aNum·x + (aDen−aNum)·(l+b)) / aDen`,
    * `b' = (bNum·(l'−l) + (bDen−bNum)·b) / bDen` — rational
    * coefficients as integer literals, one IEEE division per state per
    * step, fixed association order, so both states replay bit-exactly
    * on any engine (the ewma determinism recipe with a 2-field fold
    * state). Single-event keys take trend 0. Output:
    * `(key, n_events, level, trend)`.
    *
    * Scale shape: one per-key aggregate; state per key is the sorted
    * event list during the fold — the same bounded-per-entity contract
    * as ewmaLast (cap upstream for pathological keys).
    */
  def holtLast(events: DataFrame, aNum: Long, aDen: Long,
               bNum: Long, bDen: Long,
               keyCol: String = "user_id", tsCol: String = "ts",
               valueCol: String = "value"): DataFrame = {
    require(0 < aNum && aNum <= aDen && 0 < bNum && bNum <= bDen,
      s"holtLast: alphas must be rationals in (0, 1]: $aNum/$aDen, $bNum/$bDen")
    val pair = struct(col(tsCol), col(valueCol).cast("double").as("v"))
    val state = events.groupBy(col(keyCol))
      .agg(sort_array(collect_list(pair)).as("_a"), count(lit(1)).as("n_events"))
      .select(col(keyCol), col("n_events"),
        aggregate(
          slice(col("_a"), lit(2), size(col("_a")) - 1),
          struct(
            element_at(col("_a"), 1).getField("v").as("l"),
            when(size(col("_a")) >= 2,
              element_at(col("_a"), 2).getField("v") -
                element_at(col("_a"), 1).getField("v"))
              .otherwise(lit(0.0)).as("b")),
          (acc, e) => {
            val l2 = (lit(aNum) * e.getField("v") +
              lit(aDen - aNum) * (acc.getField("l") + acc.getField("b"))) / lit(aDen)
            struct(l2.as("l"),
              ((lit(bNum) * (l2 - acc.getField("l")) +
                lit(bDen - bNum) * acc.getField("b")) / lit(bDen)).as("b"))
          }).as("_h"))
    state.select(col(keyCol), col("n_events"),
      col("_h.l").as("level"), col("_h.b").as("trend"))
  }

  /** Per-key rolling z-score anomaly flag with EXACT integer
    * arithmetic — the telemetry outlier gate: an event is anomalous
    * when its value deviates from the mean of its own trailing window
    * by more than `z` population standard deviations. The test is
    * cross-multiplied so no square root or float mean is ever taken:
    * with window sums `s1 = Σv`, `s2 = Σv²` over the `k` PRECEDING
    * events (current excluded),
    * `|x − s1/n| > z·σ  ⟺  (n·x − s1)² > z²·(n·s2 − s1²)`
    * — all int64 on centi-units (`DECIMAL(18,2)·100`, the engine-exact
    * money convention every ev_ query here uses), so the verdict
    * replays bit-exactly in any engine. Events with fewer than
    * `minPrev` predecessors are never flagged (cold start).
    *
    * Magnitude contract: centi-values must stay within ±10⁷ (±100 000
    * whole units) so `(n·x − s1)²` fits int64 at k ≤ 100 — ENFORCED
    * in-plan with `raise_error` (the zValue rule: silent two's-
    * complement wrap on out-of-contract input would flip verdicts
    * silently; a loud failure never does).
    *
    * Scale shape: one window partitioned by the entity key (high
    * cardinality, never a funnel), ROWS frame of k — single shuffle,
    * state bounded by k per key.
    */
  def anomalies(events: DataFrame, k: Int, z: Long, minPrev: Int = 3,
                keyCol: String = "user_id", tsCol: String = "ts",
                idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(k >= 1 && k <= 100 && z >= 1 && minPrev >= 1,
      s"anomalies: need 1<=k<=100, z>=1, minPrev>=1; got k=$k z=$z minPrev=$minPrev")
    val raw = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast("long")
    val v = when(abs(raw) > 10000000L,
        raise_error(concat(lit("anomalies: |value| exceeds the 100000-unit "
          + "int64-safe domain: "), col(valueCol).cast("string"))).cast("long"))
      .otherwise(raw)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-k, -1)
    events
      .withColumn("_v", v)
      .withColumn("_n", count(col("_v")).over(w))
      .withColumn("_s1", sum(col("_v")).over(w))
      .withColumn("_s2", sum(col("_v") * col("_v")).over(w))
      .select(col(keyCol), col(idCol), col(tsCol), col(valueCol),
        col("_n").as("n_prev"),
        (col("_n") >= minPrev &&
          (col("_n") * col("_v") - col("_s1")) * (col("_n") * col("_v") - col("_s1")) >
            lit(z * z) * (col("_n") * col("_s2") - col("_s1") * col("_s1")))
          .as("is_anomaly"))
  }

  /** Per-entity sample autocorrelation at lags `1..maxLag` — the
    * seasonality/persistence diagnostic (Box & Jenkins): is a user's
    * metric stream white noise, trending, or periodic? Uses the
    * standard biased estimator with the per-entity global mean,
    *
    *   r_ℓ = Σ_{t≤n−ℓ} (x_t − x̄)(x_{t+ℓ} − x̄) / Σ_t (x_t − x̄)²
    *
    * cross-multiplied by n² so every term is an exact integer: with
    * centi-quantized values and per-entity (n, S = Σx), the deviation
    * `d_t = n·x_t − S` is int64, products accumulate in DECIMAL(38,0),
    * and each r_ℓ is ONE final IEEE division — bit-identical on any
    * engine at any partitioning. Events order by (ts, event id), the
    * house total order. NULL values are excluded up front (family
    * convention — cf. giniCoefficient/trimmedMean): a NULL has no
    * deviation, and letting it occupy a slot would inflate n in every
    * d = n·x − S term. Output: `(entity, lag, n, acf)` — acf NULL for
    * constant series (zero variance, undefined) and for lags ≥ n.
    *
    * Scale shape: one entity-keyed aggregate for (n, S), joined back
    * on the same key (co-partitioned — Spark reuses the exchange), ONE
    * window sort per entity producing all `maxLag` leads in a single
    * pass, one (entity)-grouped final aggregate; per-entity state is
    * maxLag+2 numbers. Entities parallelize; nothing global. */
  def autocorrelation(events: DataFrame, maxLag: Int,
                      entityCol: String = "user_id", tsCol: String = "ts",
                      idCol: String = "event_id",
                      valueCol: String = "value"): DataFrame = {
    require(maxLag >= 1 && maxLag <= 100,
      s"autocorrelation: need 1 <= maxLag <= 100, got $maxLag")
    val D38 = DecimalType(38, 0)
    // loud-failure guard (cf. giniCoefficient/trimmedMean): non-ANSI
    // casts NULL silently past DECIMAL(18,2)'s 10^16 bound, and a
    // NULLed _v here would stay counted in _n while dropping out of
    // _s, corrupting every d = n·x − S term
    val raw = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast("long")
    val v = when(col(valueCol).isNotNull && raw.isNull,
        raise_error(concat(lit("autocorrelation: |value| exceeds the "
          + "DECIMAL(18,2)-safe 10^16 domain: "),
          col(valueCol).cast("string"))).cast("long"))
      .otherwise(raw)
    val base = events.filter(col(valueCol).isNotNull)
      .select(col(entityCol).as("_e"), col(tsCol).as("_ts"),
        col(idCol).as("_id"), v.as("_v"))
    val stats = base.groupBy(col("_e"))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"))
    val w = Window.partitionBy(col("_e")).orderBy(col("_ts"), col("_id"))
    val dev = base.join(stats, "_e")
      .withColumn("_d", col("_n") * col("_v") - col("_s"))
    val leads = (1 to maxLag).foldLeft(dev) { (df, l) =>
      df.withColumn(s"_d$l", lead(col("_d"), l).over(w))
    }
    // cast BEFORE the product: d can reach n·|x| ≈ 10^13 on billion-
    // event entities, so d² overflows int64 — the decimal multiply is
    // exact to 10^38
    val aggs = sum(col("_d").cast(D38) * col("_d").cast(D38)).as("_den") +:
      (1 to maxLag).map(l =>
        sum(col("_d").cast(D38) * col(s"_d$l").cast(D38)).as(s"_num$l"))
    val per = leads.groupBy(col("_e"), col("_n"))
      .agg(aggs.head, aggs.tail: _*)
    per.select(col("_e").as(entityCol), col("_n").as("n"), col("_den"),
        explode(array((1 to maxLag).map(l =>
          struct(lit(l).cast(LongType).as("lag"),
            col(s"_num$l").as("num"))): _*)).as("_x"))
      .select(col(entityCol), col("_x.lag").as("lag"), col("n"),
        when(col("_den") =!= 0 && col("_x.num").isNotNull,
          col("_x.num").cast(DoubleType) / col("_den").cast(DoubleType))
          .as("acf"))
  }

  /** Mann–Kendall trend test over each entity's most recent `k`
    * events (Mann 1945, Kendall 1975) — the nonparametric "is this
    * metric drifting?" monitor: S = Σ_{i<j} sign(x_j − x_i) over the
    * time-ordered window, with the tie-corrected variance
    *
    *   Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
    *
    * (t_g = size of each tied value group). Bounding the test to the
    * most recent `k` events is what makes the O(k²) pairwise sign sum
    * scale-safe: work per entity is a constant k(k−1)/2, monitoring
    * drift NOW rather than averaging over all history. S, n, and the
    * 18·Var numerator are exact int64; the reported `trend` normalizes
    * S by √Var as a fixed tree of correctly-rounded double ops
    * (division, sqrt, division) — bit-identical on any engine. NULL
    * values are excluded up front (family convention): a NULL would
    * otherwise consume a recency-window slot and act as a tie against
    * every other value. Output:
    * `(entity, n, s_stat, var18, trend)`; trend is NULL when Var = 0
    * (fewer than 2 distinct values) and the row is absent for
    * single-event entities.
    *
    * Scale shape: one window pass ranks events newest-first (per-entity
    * sort, entities parallel), the ≤k survivors self-join ON THE
    * ENTITY KEY (k² bounded rows per entity), tie groups re-aggregate
    * the same bounded frame; output is entity-sized. */
  def mannKendallRecent(events: DataFrame, k: Int,
                        entityCol: String = "user_id", tsCol: String = "ts",
                        idCol: String = "event_id",
                        valueCol: String = "value"): DataFrame = {
    require(k >= 2 && k <= 1000,
      s"mannKendallRecent: need 2 <= k <= 1000, got $k")
    // loud-failure guard (cf. autocorrelation above): an out-of-domain
    // value would otherwise consume a recency-window slot as NULL and
    // tie against every other value
    val raw = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast("long")
    val v = when(col(valueCol).isNotNull && raw.isNull,
        raise_error(concat(lit("mannKendallRecent: |value| exceeds the "
          + "DECIMAL(18,2)-safe 10^16 domain: "),
          col(valueCol).cast("string"))).cast("long"))
      .otherwise(raw)
    val wDesc = Window.partitionBy(col("_e"))
      .orderBy(col("_ts").desc, col("_id").desc)
    val recent = events.filter(col(valueCol).isNotNull)
      .select(col(entityCol).as("_e"), col(tsCol).as("_ts"),
        col(idCol).as("_id"), v.as("_v"))
      .withColumn("_rn", row_number().over(wDesc))
      .filter(col("_rn") <= k)
      // time-ascending position within the window: k+1−rn
      .select(col("_e"), (lit(k + 1) - col("_rn")).as("_p"), col("_v"))
    val x = recent.alias("x")
    val y = recent.alias("y")
    val s = x.join(y, col("x._e") === col("y._e") && col("x._p") < col("y._p"))
      .groupBy(col("x._e").as("_e"))
      .agg(sum(when(col("y._v") > col("x._v"), 1L)
        .when(col("y._v") < col("x._v"), -1L)
        .otherwise(0L)).as("s_stat"))
    val nPer = recent.groupBy(col("_e")).agg(count(lit(1)).as("n"))
    val ties = recent.groupBy(col("_e"), col("_v"))
      .agg(count(lit(1)).as("_t"))
      .groupBy(col("_e"))
      .agg(sum(col("_t") * (col("_t") - 1) * (lit(2) * col("_t") + 5))
        .as("_tie"))
    nPer.join(ties, "_e").join(s, "_e")
      .filter(col("n") >= 2)
      .select(col("_e").as(entityCol), col("n"), col("s_stat"),
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("_tie"))
          .as("var18"))
      .withColumn("trend",
        when(col("var18") > 0,
          col("s_stat").cast(DoubleType) /
            sqrt(col("var18").cast(DoubleType) / lit(18.0d))))
  }
}
