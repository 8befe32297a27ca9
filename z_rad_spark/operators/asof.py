"""Sort-merge as-of join — the engine's point-in-time primitive.

Spark has no native as-of join; this implements the scalable
union-tag-and-last(ignorenulls) formulation:

1. union the build side (turns) and probe side (cutoffs) on the entity key
   with a source tag,
2. one hash exchange + ONE sort per partition on
   (key, t, src, tie-break) — a sort-merge shape, never a broadcast of the
   big side,
3. running ``last(value, ignorenulls=True)`` carries the latest build
   state forward; probe rows then hold exactly the state as of their
   timestamp (inclusive: build sorts before probe at equal t).

At 10^12-turn scale this is shuffle-optimal: a single exchange keyed by
conv_id, no join explosion, skew handled by AQE skew-split plus
operators/skew.py salting. Reference analogue: the implicit "whole image
at scan time" snapshot (SURVEY.md §0) made explicit.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def cutoff_grid(spark: SparkSession, cutoffs: Iterable[str]) -> DataFrame:
    """Tiny dimension of as-of cutoffs (always broadcast-joined)."""
    return spark.createDataFrame([(c,) for c in cutoffs], "as_of_str string").select(
        F.to_timestamp("as_of_str").alias("as_of")
    )


def expand_cutoffs(entities: DataFrame, grid: DataFrame) -> DataFrame:
    """entity x cutoff probe frame via broadcast cross join (grid is tiny)."""
    return entities.crossJoin(F.broadcast(grid))


def asof_join(
    turns: DataFrame,
    probes: DataFrame,
    value_cols: list[str],
    key: str = "conv_id",
    turns_ts: str = "ts",
    probe_ts: str = "as_of",
    tie_break: str = "turn_idx",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each probe row (key, probe_ts), attach the latest value_cols from
    the turn with the greatest (ts, tie_break) such that ts <= probe_ts.

    ``direction`` (pandas ``merge_asof`` parity, both inclusive):

    * ``'backward'`` (default) — the turn with the greatest
      (ts, tie_break) such that ts <= probe_ts; the running-last pass
      described above.
    * ``'forward'`` — the turn with the SMALLEST (ts, tie_break) such
      that ts >= probe_ts: the mirrored pass — same union frame, same
      single hash exchange on the key, a second sort DESCENDING on
      (t, tie) with build rows still scanning before probe rows at
      equal t (inclusive), and the identical running
      last(ignorenulls); "the most recently scanned build value" in a
      descending scan IS the earliest turn at-or-after the probe.
    * ``'nearest'`` — both passes over the ONE exchange (Catalyst
      plans Window/Sort/Window/Sort on the same HashPartitioning — no
      second shuffle), then per value column the closer of the two
      matches by |turn ts - probe ts|, ties to backward (the pandas
      convention).

    ``tolerance_seconds``: when set, a match farther than the tolerance
    (older for backward, later for forward, |distance| for nearest) is
    treated as no match — values null, same as no matching turn.
    Tolerance and nearest-ness are judged PER VALUE COLUMN: because the
    running last(ignorenulls) fills each column past adjacent turns
    whose column is NULL, the match each column is judged against is
    the nearest turn where THAT column is non-null. This is
    deliberately stronger than pandas ``merge_asof(tolerance=...)``,
    which judges the whole ROW against the
    last matching turn's ts (the two coincide when value columns have no
    NULLs). The matched timestamps ride the same running-last pass, so
    the staleness check adds zero extra shuffles or sorts.

    Returns the probe rows + value columns (null when no prior turn).
    """
    probe_extra = [c for c in probes.columns if c not in (key, probe_ts)]
    t = turns.select(
        F.col(key),
        F.col(turns_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.col(tie_break).cast("long").alias("_tie"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_extra],
    )
    p = probes.select(
        F.col(key),
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(2**62).cast("long").alias("_tie"),
        *[F.lit(None).cast(turns.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in probe_extra],
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    u = t.unionByName(p)
    t_us = F.unix_micros(F.col("_t").cast("timestamp"))
    tol_us = (
        int(tolerance_seconds * 1_000_000) if tolerance_seconds is not None else None
    )
    # Backward scan: ascending (t, src, tie) — build rows sort before
    # probe rows at equal t (inclusive match), running last(ignorenulls)
    # carries the greatest (t, tie) build value seen so far.
    w_b = (
        Window.partitionBy(key)
        .orderBy("_t", "_src", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward scan: the mirror — DESCENDING t with build still scanning
    # before probe at equal t (src ascending) and tie DESCENDING, so the
    # most recently scanned build row when a probe is reached is the
    # SMALLEST (t, tie) at-or-after it. Same partitioning as w_b: one
    # hash exchange serves both passes (the second pass adds a Sort,
    # never an Exchange).
    w_f = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").desc(), F.col("_src").asc(), F.col("_tie").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    need_mt = tol_us is not None or direction == "nearest"

    def _match(c, w, side):
        """Per-column matched value (+ matched ts when needed): judged
        against the nearest turn where THAT column is non-null — the
        matched ts is captured from the same scan BEFORE the fill (last
        ignorenulls can carry a value past adjacent turns whose column
        is NULL; judging against the newest scanned turn's ts would
        mislabel that carried value)."""
        nonlocal u
        if need_mt:
            u = u.withColumn(
                f"_mt{side}_{c}",
                F.last(
                    F.when((F.col("_src") == 0) & F.col(c).isNotNull(), t_us),
                    ignorenulls=True,
                ).over(w),
            )
        u = u.withColumn(f"_v{side}_{c}", F.last(F.col(c), ignorenulls=True).over(w))

    for c in value_cols:
        if need_b:
            _match(c, w_b, "b")
        if need_f:
            _match(c, w_f, "f")
    out_vals = []
    for c in value_cols:
        if direction == "backward":
            v = F.col(f"_vb_{c}")
            if tol_us is not None:
                v = F.when((t_us - F.col(f"_mtb_{c}")) <= F.lit(tol_us), v)
        elif direction == "forward":
            v = F.col(f"_vf_{c}")
            if tol_us is not None:
                v = F.when((F.col(f"_mtf_{c}") - t_us) <= F.lit(tol_us), v)
        else:  # nearest: closer of the two matches, ties to backward
            d_b = t_us - F.col(f"_mtb_{c}")
            d_f = F.col(f"_mtf_{c}") - t_us
            use_b = F.col(f"_mtb_{c}").isNotNull() & (
                F.col(f"_mtf_{c}").isNull() | (d_b <= d_f)
            )
            v = F.when(use_b, F.col(f"_vb_{c}")).otherwise(F.col(f"_vf_{c}"))
            if tol_us is not None:
                v = F.when(F.when(use_b, d_b).otherwise(d_f) <= F.lit(tol_us), v)
        out_vals.append(v.alias(c))
    return u.filter(F.col("_src") == 1).select(
        F.col(key), F.col("_t").alias(probe_ts), *probe_extra, *out_vals
    )


def asof_state(
    turns: DataFrame,
    spark: SparkSession,
    cutoffs: Iterable[str],
    value_cols: list[str],
    key: str = "conv_id",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """State of every conversation at every cutoff: grid expansion + as-of.

    Entities are enumerated from the turns themselves (distinct keys reuse
    the same hash partitioning)."""
    grid = cutoff_grid(spark, cutoffs)
    probes = expand_cutoffs(turns.select(key).distinct(), grid)
    return asof_join(
        turns,
        probes,
        value_cols,
        key=key,
        tolerance_seconds=tolerance_seconds,
        direction=direction,
    )


def horizon_features(
    df: DataFrame,
    spark,
    cutoffs,
    horizons=(3600, 21600, 86400),
    signal_col: str = "signal",
) -> DataFrame:
    """Multi-horizon point-in-time activity features: at each as-of
    cutoff, per conversation, the turn count inside each trailing
    window (1h / 6h / 24h by default), the full-history count, the
    24h mean signal, and the short/long velocity ratio
    (n_1h / (n_24h / 24) — 'is the last hour running hot against its
    own day?'). The feature-store lookback matrix beside the
    full-history [[stats_asof]] moments — and every window is
    ts <= cutoff, so the zero-temporal-leakage contract holds by
    construction.

    Determinism: counts and signal sums are exact longs per (conv,
    cutoff, horizon); means/ratios are fixed chains. Bit-replayable.

    Scale: turns join the BROADCAST cutoff grid (|cutoffs| is a small
    snapshot schedule — 3 here, weekly in production) and aggregate
    with conditional sums in ONE map-side-combined pass; no
    turns x horizons expansion ever shuffles. Output: (conv_id,
    as_of, n_1h, n_6h, n_24h, n_total longs, mean_sig_24h, velocity
    doubles — NULL where a denominator window is empty), one row per
    (conversation, cutoff) with at least one pre-cutoff turn.
    """
    h1, h6, h24 = (int(h) for h in horizons)
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    x = F.col(signal_col).cast("long")
    j = df.crossJoin(F.broadcast(grid)).where(
        F.col("ts").cast("timestamp") <= F.col("as_of")
    )
    # exact integer microsecond age — no truncating seconds cast
    age = F.unix_micros(F.col("as_of")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    h1, h6, h24 = h1 * 1_000_000, h6 * 1_000_000, h24 * 1_000_000
    g = j.groupBy("conv_id", "as_of").agg(
        F.sum(F.when(age < h1, 1).otherwise(0)).cast("long").alias("n_1h"),
        F.sum(F.when(age < h6, 1).otherwise(0)).cast("long").alias("n_6h"),
        F.sum(F.when(age < h24, 1).otherwise(0)).cast("long").alias("n_24h"),
        F.count("*").cast("long").alias("n_total"),
        F.sum(F.when(age < h24, x)).cast("long").alias("_s24"),
    )
    n24 = F.col("n_24h")
    mean24 = F.col("_s24").cast("double") / n24.cast("double")
    velocity = F.col("n_1h").cast("double") / (
        n24.cast("double") / F.lit(float(h24) / float(h1))
    )
    return g.select(
        "conv_id",
        "as_of",
        "n_1h",
        "n_6h",
        "n_24h",
        "n_total",
        F.when(n24 > 0, mean24).alias("mean_sig_24h"),
        F.when(n24 > 0, velocity).alias("velocity"),
    )


def recency_features(
    df: DataFrame,
    spark,
    cutoffs,
    roles=("user", "assistant", "tool", "system"),
) -> DataFrame:
    """Per-role recency vector at each as-of cutoff: seconds since the
    conversation last heard from each role (NULL = never before the
    cutoff) plus seconds since ANY turn — the 'how stale is each
    participant?' feature every churn / handoff model starts from,
    computed leakage-safe (only ts <= cutoff is read; the complement
    of [[asof_state]]'s last-VALUE lookup — this is last-WHEN).

    Determinism: per-(conv, cutoff) conditional MAX of exact epoch
    micros, then fixed subtractions. Bit-replayable.

    Scale: broadcast cutoff grid, one conditional-aggregate pass
    (roles are a fixed enum -> fixed column set, no pivot shuffle).
    Output: (conv_id, as_of, sec_since_any double, sec_since_<role>
    double ...), one row per (conversation, cutoff) with history.
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    j = df.crossJoin(F.broadcast(grid)).where(
        F.col("ts").cast("timestamp") <= F.col("as_of")
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    aggs = [F.max(ts_us).alias("_any")]
    for r in roles:
        aggs.append(
            F.max(F.when(F.col("role") == r, ts_us)).alias(f"_r_{r}")
        )
    g = j.groupBy("conv_id", "as_of").agg(*aggs)
    co_us = F.unix_micros(F.col("as_of"))
    cols = [
        "conv_id",
        "as_of",
        ((co_us - F.col("_any")).cast("double") / F.lit(1e6)).alias(
            "sec_since_any"
        ),
    ]
    for r in roles:
        cols.append(
            F.when(
                F.col(f"_r_{r}").isNotNull(),
                (co_us - F.col(f"_r_{r}")).cast("double") / F.lit(1e6),
            ).alias(f"sec_since_{r}")
        )
    return g.select(*cols)


def trend_asof(
    df: DataFrame,
    spark,
    cutoffs,
    signal_col: str = "signal",
) -> DataFrame:
    """Per-conversation signal trend at each as-of cutoff: the exact
    OLS slope/intercept of signal over turn index using ONLY turns
    with ts <= cutoff — the 'is this conversation heating up or
    cooling down?' feature, leakage-safe by construction, the
    per-entity point-in-time counterpart to the corpus-level
    [[q_signal_trend]] / [[q_theil_sen]] fits.

    Determinism: the four sufficient sums ride DECIMAL(38,0) exact
    products (turn_idx * signal passes 2^63 only far beyond any real
    conversation, but the headroom is free); slope/intercept/r2 are
    fixed double chains. Bit-replayable.

    Scale: broadcast cutoff grid + ONE map-side-combined aggregate —
    no per-conversation window, no turns x cutoffs shuffle beyond the
    bounded grid join. Output: (conv_id, as_of, n long, slope,
    intercept, r2 doubles — NULL when n < 2 or variance degenerates).
    """
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    x = F.col("turn_idx").cast("long")
    y = F.col(signal_col).cast("long")
    j = (
        df.where(y.isNotNull())
        .crossJoin(F.broadcast(grid))
        .where(F.col("ts").cast("timestamp") <= F.col("as_of"))
    )
    g = j.groupBy("conv_id", "as_of").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d19(x)).alias("_sx"),
        F.sum(d19(x) * d19(x)).alias("_sxx"),
        F.sum(d19(y)).alias("_sy"),
        F.sum(d19(y) * d19(y)).alias("_syy"),
        F.sum(d19(x) * d19(y)).alias("_sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    sy = F.col("_sy").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    cov = nd * sxy - sx * sy
    slope = cov / vx
    intercept = (sy - slope * sx) / nd
    r2 = (cov * cov) / (vx * vy)
    ok = (F.col("n") >= 2) & (vx > 0)
    return g.select(
        "conv_id",
        "as_of",
        "n",
        F.when(ok, slope).alias("slope"),
        F.when(ok, intercept).alias("intercept"),
        F.when(ok & (vy > 0), r2).alias("r2"),
    )


def sessions_asof(
    df: DataFrame,
    spark,
    cutoffs,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Session-count state at each as-of cutoff: how many gap-based
    sessions (gap > ``gap_seconds``) the conversation has accumulated
    using only ts <= cutoff, plus seconds since the current session
    started — the point-in-time view of [[q_sessionize]]'s full-table
    segmentation (a feature store can't run the full sessionizer per
    cutoff; this derives the same counts from ONE lag pass reused by
    every cutoff).

    The lag pass marks each turn as a session BOUNDARY (first turn,
    or gap from the previous turn > gap_seconds); for a cutoff,
    n_sessions = # boundaries with ts <= cutoff and session_start =
    the latest boundary ts <= cutoff — conditional exact aggregates,
    no per-cutoff re-sort.

    Determinism: boundaries come from exact microsecond gaps on the
    stable (ts, turn_idx) order; counts/maxes are exact; the seconds
    column is one fixed subtraction. Bit-replayable.

    Output: (conv_id, as_of, n_turns long, n_sessions long,
    sec_in_session double), one row per (conversation, cutoff) with
    history.
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = df.select(
        "conv_id",
        F.col("ts").cast("timestamp").alias("ts"),
        ts_us.alias("_us"),
        F.lag(ts_us, 1).over(w).alias("_prev"),
    ).select(
        "conv_id",
        "ts",
        "_us",
        (
            F.col("_prev").isNull()
            | ((F.col("_us") - F.col("_prev")) > int(gap_seconds) * 1_000_000)
        ).alias("_boundary"),
    )
    j = marked.crossJoin(F.broadcast(grid)).where(F.col("ts") <= F.col("as_of"))
    g = j.groupBy("conv_id", "as_of").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("_boundary"), 1).otherwise(0))
        .cast("long")
        .alias("n_sessions"),
        F.max(F.when(F.col("_boundary"), F.col("_us"))).alias("_start"),
    )
    sec = (F.unix_micros(F.col("as_of")) - F.col("_start")).cast("double") / F.lit(
        1e6
    )
    return g.select(
        "conv_id",
        "as_of",
        "n_turns",
        "n_sessions",
        F.when(F.col("_start").isNotNull(), sec).alias("sec_in_session"),
    )


def state_matrix(
    df: DataFrame,
    spark,
    cutoffs,
    roles=("user", "assistant", "tool", "system"),
    signal_col: str = "signal",
) -> DataFrame:
    """Per-role last-VALUE matrix at each as-of cutoff: for every
    conversation and cutoff, the signal of each role's most recent
    turn with ts <= cutoff (NULL = that role never spoke) — the
    companion to [[recency_features]] (last-WHEN) and the per-role
    widening of [[asof_state]] (which carries only the single latest
    turn): together they are the conversation's full as-of state
    vector.

    Determinism: each cell is ONE conditional MAX over the exact
    (ts_us, turn_idx, signal) struct — the stable-order argmax with
    no window and no per-role shuffle (roles are a fixed enum ->
    fixed column set). Leakage-safe by construction. Bit-replayable.

    Output: (conv_id, as_of, last_sig_<role> double ...), one row per
    (conversation, cutoff) with history.
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    j = df.crossJoin(F.broadcast(grid)).where(
        F.col("ts").cast("timestamp") <= F.col("as_of")
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    aggs = []
    for r in roles:
        aggs.append(
            F.max(
                F.when(
                    F.col("role") == r,
                    F.struct(
                        ts_us.alias("_t"),
                        F.col("turn_idx").cast("long").alias("_i"),
                        F.col(signal_col).cast("long").alias("_s"),
                    ),
                )
            ).alias(f"_m_{r}")
        )
    g = j.groupBy("conv_id", "as_of").agg(*aggs)
    cols = ["conv_id", "as_of"]
    for r in roles:
        cols.append(
            F.col(f"_m_{r}._s").cast("double").alias(f"last_sig_{r}")
        )
    return g.select(*cols)


def distinct_asof(
    df: DataFrame,
    spark,
    cutoffs,
) -> DataFrame:
    """Exact distinct-count state at each as-of cutoff: per
    conversation, how many distinct roles and distinct tools have
    appeared with ts <= cutoff — the breadth features ('has this
    conversation engaged the tool surface yet?') beside the volume
    features of [[horizon_features]].

    Determinism: exact COUNT(DISTINCT) per (conv, cutoff) — integer
    results, no estimation. Leakage-safe by construction.

    Scale: the broadcast grid join then ONE aggregate with two
    distinct aggs (Spark plans expand + two-phase exact distinct —
    bounded by the enum cardinalities, no high-cardinality distinct
    here). Output: (conv_id, as_of, n_turns long, n_roles long,
    n_tools long).
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    j = df.crossJoin(F.broadcast(grid)).where(
        F.col("ts").cast("timestamp") <= F.col("as_of")
    )
    return j.groupBy("conv_id", "as_of").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.count_distinct(F.col("role")).cast("long").alias("n_roles"),
        F.count_distinct(F.col("tool")).cast("long").alias("n_tools"),
    )


def answer_rate_asof(
    df: DataFrame,
    spark,
    cutoffs,
) -> DataFrame:
    """Answered-rate state at each as-of cutoff: of the conversation's
    user turns with ts <= cutoff, what share were followed by an
    assistant turn THAT ALSO falls within the cutoff — the
    conversational-health feature ('are questions getting answered,
    as of now?') with the subtle leakage trap handled: a user turn
    whose answer arrives AFTER the cutoff counts as unanswered at
    that cutoff (the follower's ts must clear the same bar, otherwise
    the feature reads the future).

    Determinism: the follower derives from one lead() pass on the
    stable turn order (computed once, reused by every cutoff);
    counts are exact conditional sums. Bit-replayable.

    Output: (conv_id, as_of, n_user long, n_answered long,
    answer_rate double — NULL when no user turns yet), one row per
    (conversation, cutoff) with history.
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    marked = df.select(
        "conv_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "role",
        F.lead("role", 1).over(w).alias("_nrole"),
        F.lead(F.col("ts").cast("timestamp"), 1).over(w).alias("_nts"),
    )
    j = marked.crossJoin(F.broadcast(grid)).where(F.col("ts") <= F.col("as_of"))
    is_user = F.col("role") == "user"
    answered = (
        is_user
        & (F.col("_nrole") == "assistant")
        & (F.col("_nts") <= F.col("as_of"))
    )
    g = j.groupBy("conv_id", "as_of").agg(
        F.sum(F.when(is_user, 1).otherwise(0)).cast("long").alias("n_user"),
        F.sum(F.when(answered, 1).otherwise(0)).cast("long").alias("n_answered"),
    )
    return g.select(
        "conv_id",
        "as_of",
        "n_user",
        "n_answered",
        F.when(
            F.col("n_user") > 0,
            F.col("n_answered").cast("double") / F.col("n_user").cast("double"),
        ).alias("answer_rate"),
    )


def quantile_state_asof(
    df: DataFrame,
    spark,
    cutoffs,
    signal_col: str = "signal",
) -> DataFrame:
    """Expanding signal quartiles at each as-of cutoff: exact
    rank-pick p25/p50/p75 of each conversation's signal HISTORY
    (ts <= cutoff) — the distribution-shape state beside
    [[trend_asof]]'s direction and [[horizon_features]]'s volume
    (an IQR that widened between cutoffs is volatility the mean
    hides), leakage-safe by construction.

    Determinism: quantiles are EXACT integer rank picks
    (ceil(q n), value asc — no interpolation) on the compacted
    (conv, cutoff, value) histogram; counts exact. Bit-replayable.

    Scale: broadcast grid join -> one (conv, cutoff, value) groupBy
    (value cardinality bounds the state) -> rank windows on the
    compacted frame. Output: (conv_id, as_of, n long, p25, p50, p75
    doubles), one row per (conversation, cutoff) with history.
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    x = F.col(signal_col).cast("double")
    j = (
        df.where(x.isNotNull())
        .crossJoin(F.broadcast(grid))
        .where(F.col("ts").cast("timestamp") <= F.col("as_of"))
    )
    hist = j.groupBy("conv_id", "as_of", x.alias("_v")).agg(
        F.count("*").cast("long").alias("_m")
    )
    w_cum = (
        Window.partitionBy("conv_id", "as_of")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("conv_id", "as_of")
    cum = hist.select(
        "conv_id",
        "as_of",
        "_v",
        F.sum("_m").over(w_cum).cast("long").alias("_cm"),
        F.sum("_m").over(w_all).cast("long").alias("_n"),
    )

    def pick(q):
        thresh = F.ceil(F.lit(q) * F.col("_n")).cast("long")
        return F.min(F.when(F.col("_cm") >= thresh, F.col("_v")))

    return cum.groupBy("conv_id", "as_of").agg(
        F.max("_n").cast("long").alias("n"),
        pick(0.25).alias("p25"),
        pick(0.50).alias("p50"),
        pick(0.75).alias("p75"),
    )


def role_mix_asof(
    df: DataFrame,
    spark,
    cutoffs,
    roles=("user", "assistant", "tool", "system"),
) -> DataFrame:
    """Role-mix share vector at each as-of cutoff: each role's share
    of the conversation's turns so far — the composition state
    ('is this becoming a tool-call loop?') that completes the
    point-in-time family (volume / recency / trend / sessions /
    last-values / breadth / quartiles / composition), leakage-safe by
    construction.

    Determinism: exact conditional counts, one division per share.
    Output: (conv_id, as_of, n long, share_<role> double ...).
    """
    grid = spark.createDataFrame(
        [(c,) for c in cutoffs], "as_of string"
    ).select(F.col("as_of").cast("timestamp").alias("as_of"))
    j = df.crossJoin(F.broadcast(grid)).where(
        F.col("ts").cast("timestamp") <= F.col("as_of")
    )
    aggs = [F.count("*").cast("long").alias("n")]
    for r in roles:
        aggs.append(
            F.sum(F.when(F.col("role") == r, 1).otherwise(0))
            .cast("long")
            .alias(f"_c_{r}")
        )
    g = j.groupBy("conv_id", "as_of").agg(*aggs)
    cols = ["conv_id", "as_of", "n"]
    for r in roles:
        cols.append(
            F.when(
                F.col("n") > 0,
                F.col(f"_c_{r}").cast("double") / F.col("n").cast("double"),
            ).alias(f"share_{r}")
        )
    return g.select(*cols)
