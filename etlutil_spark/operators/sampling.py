"""Deterministic sampling & dataset splitting for training-data pipelines.

``df.sample()`` is nondeterministic across retries and cluster layouts —
unacceptable for training data, where a resampled pipeline must produce
the SAME corpus (reproducibility, dedup against previous runs, leakage
audits). Everything here derives decisions from a content hash instead:

  - hash is the portable 60-bit md5 family (functions/hashing.py), so the
    exact sample is reproducible in any engine (DuckDB oracle twins) and
    across Spark versions;
  - decisions are per-row map-side expressions — zero shuffles, pure
    codegen, trivially parallel at any scale;
  - a seed string namespaces the hash so independent samples of the same
    table are independent.

The same mechanism powers train/eval/test splitting (hash-range
assignment): unlike random splits, a row's split NEVER changes when the
corpus grows — the property that prevents eval contamination across
dataset releases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etlutil_spark.functions.hashing import md5_bigint

# md5_bigint yields 60-bit non-negative values
_HASH_SPACE = float(2**60)


def _unit_hash(key_col: Column | str, seed: str) -> Column:
    """Deterministic uniform [0, 1) value per key."""
    return md5_bigint(key_col, seed=seed) / F.lit(_HASH_SPACE)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    *,
    seed: str = "sample",
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_col``.

    Reproducible on retry, across cluster layouts, and across engines;
    a row's fate depends only on (key, seed). Map-side filter — the
    predicate reaches the scan, so at 100 TB the discarded rows still get
    read (hash needs the key) but never shuffle anywhere.

    NULL keys are DROPPED at any rate (hash of NULL is NULL, and a NULL
    predicate filters): sample keys should be identifiers — coalesce or
    filter NULL keys upstream if they must participate."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_unit_hash(key_col, seed) < F.lit(rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    *,
    default_rate: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source rebalancing
    primitive (downsample the English firehose, keep all of the rare
    languages). ``rates`` maps stratum value -> keep rate; strata not
    listed keep ``default_rate``. One when-chain, zero shuffles."""
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate}")
    rate_expr: Column = F.lit(default_rate)
    for stratum, rate in rates.items():
        rate_expr = F.when(F.col(strata_col) == stratum, F.lit(rate)).otherwise(
            rate_expr
        )
    return df.where(_unit_hash(key_col, seed) < rate_expr)


def take_n_per_stratum(
    df: DataFrame,
    n: int,
    strata_col: str,
    key_col: str,
    *,
    seed: str = "sample",
) -> DataFrame:
    """EXACTLY min(n, stratum size) rows per stratum, chosen by hash order.

    Rate-based sampling gives binomial counts; eval-set construction wants
    exact ones. Ordering each stratum by the content hash (tie-broken by
    key) makes the selection deterministic AND stable under corpus growth
    in expectation's limit — a new row displaces at most one old row, it
    never reshuffles the whole sample the way random orderings do.

    One shuffle on the stratum key; the rank window input is the stratum's
    rows, so pick strata with bounded cardinality (lang, source) or salt
    first at extreme skew."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        md5_bigint(key_col, seed=seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n)
        .drop("_rank")
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    *,
    splits: dict[str, float] | None = None,
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a stable train/eval/test split by hash range.

    ``splits`` maps name -> fraction (must sum to ~1). A row's split is a
    pure function of (key, seed): growing the corpus later can never move
    an existing row between splits, which is what keeps future training
    runs from leaking into a frozen eval set.

    A NULL key gets a NULL split (not silently the last bucket) — NULL
    hashes through to NULL, and quietly routing unkeyed rows into the
    test set is exactly the contamination this operator exists to
    prevent."""
    splits = splits or {"train": 0.98, "eval": 0.01, "test": 0.01}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = _unit_hash(key_col, seed)
    expr: Column | None = None
    upper = 0.0
    names = list(splits)
    for name in names[:-1]:
        upper += splits[name]
        expr = (
            F.when(u < F.lit(upper), F.lit(name))
            if expr is None
            else expr.when(u < F.lit(upper), F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    # NULL key -> NULL split: the otherwise() branch must not capture rows
    # whose hash is NULL (every when-condition evaluates NULL for them)
    return df.withColumn(
        split_col, F.when(u.isNotNull(), out).otherwise(F.lit(None).cast("string"))
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    *,
    seed: str = "wsample",
) -> DataFrame:
    """EXACTLY min(n, count) rows, weighted-without-replacement, chosen
    deterministically (Efraimidis–Spirakis A-ES).

    Each row gets the A-ES priority, computed in LOG space as ln(u)/w
    with u = the content-hash uniform in (0,1) — the same ordering as
    the textbook u^(1/w) (ln is monotone), but immune to the underflow
    that collapses u^(1/w) to exactly 0.0 for small weights (u=0.4,
    w=1e-3 -> 0.4^1000 underflows; every underflowed row would tie and
    fall back to key order — a deterministic but weight-IGNORING tail).
    The top-n priorities ARE a weighted sample without replacement.
    Because u is a pure function of (key, seed), the sample is
    reproducible across retries, engines, and cluster layouts — the same
    property deterministic_sample gives unweighted sampling, which is
    what makes training mixtures auditable.

    Plan shape: priorities are computed map-side; selection is a global
    top-n = TakeOrderedAndProject (per-partition heap + driver merge of
    n*n_partitions candidates) — no single-partition sort funnel, no
    shuffle of the full table. Rows with NULL, NaN, zero, or negative
    weight are dropped (they have zero selection probability; A-ES
    priorities are undefined for them). NaN needs its own predicate:
    Spark orders NaN GREATER than every double, so a NaN weight passes
    ``w > 0`` and its NaN priority sorts first descending — NaN-weight
    rows would ALWAYS win the sample (r12 bug hunt, reproduced).

    Ties (astronomically unlikely with 60-bit hashes) break on key ASC."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col).cast("double")
    # clamp u away from exact 0 (pow(0, x) = 0 for every weight, which
    # would make hash-value 0 unsampleable regardless of weight)
    u = (md5_bigint(key_col, seed=seed) + 1) / F.lit(_HASH_SPACE + 2)
    pri = F.log(u) / w
    return (
        df.where((w > 0) & ~F.isnan(w))
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("_pri")
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
    *,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-stratum keep-rates that rebalance the corpus to ``target_shares``
    by downsampling only (never upsampling — duplication is a separate,
    deliberate decision in a training pipeline).

    Weight totals per stratum (rows when ``weight_col`` is None, else the
    column's sum — chars/tokens for corpus mixtures) determine the largest
    feasible resampled total ``T = min_s(W_s / share_s)``; each stratum then
    keeps ``share_s * T / W_s`` of its weight. Strata absent from
    ``target_shares`` get NO rate row (joining on the result drops them) —
    an explicit 0.0 share is the auditable way to say "excluded". A
    positive-share stratum with NO corpus rows raises: that is almost
    always a typo'd name, and silently renormalizing around it would
    deliver a mixture nobody asked for.

    Plan shape: ONE keyed aggregate over the corpus (the only thing that
    scales with data volume), whose |strata|-row result is collected to
    the driver for the closed-form rate arithmetic — the same O(groups)
    collect trade quantiles.py makes. Weight sums run as DECIMAL then
    cast to double, and the driver-side arithmetic is plain IEEE ops on
    those exact sums, so the rates are bit-identical across engines and
    partition orders."""
    bad = {s: v for s, v in target_shares.items() if v < 0}
    if bad:
        raise ValueError(f"negative target shares: {bad}")
    pos = {s: float(v) for s, v in target_shares.items() if v > 0}
    if not pos:
        raise ValueError("at least one target share must be positive")
    w = (
        F.sum(F.col(weight_col).cast("decimal(38,4)")).cast("double")
        if weight_col
        else F.count("*").cast("double")
    )
    totals = {
        r[stratum_col]: r["_w"]
        for r in df.groupBy(stratum_col).agg(w.alias("_w")).collect()
        if r[stratum_col] in pos
    }
    missing = sorted(set(pos) - set(totals))
    if missing:
        raise ValueError(
            f"target strata absent from the corpus (typo?): {missing}"
        )
    # A stratum whose rows exist but whose weight is NULL (all-NULL
    # weight_col) or <= 0 would otherwise surface as a bare
    # ZeroDivisionError / TypeError below — name the stratum instead.
    degenerate = sorted(
        s for s in pos if totals[s] is None or totals[s] <= 0.0
    )
    if degenerate:
        raise ValueError(
            "target strata with zero/NULL total "
            f"{'weight' if weight_col else 'rows'}: {degenerate}"
        )
    t = min(totals[s] / pos[s] for s in pos)
    rates = [(s, min(pos[s] * t / totals[s], 1.0)) for s in sorted(pos)]
    # Derive the stratum field's type from the input so non-string
    # stratum keys (e.g. an int source id) round-trip and the rate join
    # in mixture_sample stays type-aligned.
    stratum_field = df.schema[stratum_col]
    schema = T.StructType(
        [
            T.StructField(stratum_col, stratum_field.dataType, True),
            T.StructField("_rate", T.DoubleType(), False),
        ]
    )
    return df.sparkSession.createDataFrame(rates, schema)


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    target_shares: dict[str, float],
    key_col: str,
    *,
    weight_col: str | None = None,
    seed: str = "mixture",
) -> DataFrame:
    """Deterministically resample the corpus toward a target mixture
    (the Pile/Dolma-style source rebalancing step of a training-data
    pipeline): compute :func:`mixture_rates`, broadcast them back, and keep
    rows whose content-hash uniform falls under their stratum's rate.

    A row's fate depends only on (key, seed, the stratum weight totals) —
    reproducible across retries, engines, and cluster layouts, so the
    mixture is auditable after the fact. The corpus itself is touched by
    exactly one aggregate pass plus one map-side filtered pass; rates are a
    broadcast, so no data-volume shuffle beyond the totals aggregate."""
    rates = mixture_rates(
        df, stratum_col, target_shares, weight_col=weight_col
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .where(_unit_hash(key_col, seed) < F.col("_rate"))
        .drop("_rate")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 2,
    *,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: ``k``
    pseudo-random partner ids per anchor row, drawn by content hash —
    reproducible across retries, engines, and cluster layouts, so the
    training pairs are auditable exactly like the sampling operators.

    Candidates are ``hash(anchor, j) mod (max_id + 1)`` with a +1 skip
    when the draw hits the anchor itself (sampling WITH replacement
    across ``j`` — duplicate negatives for one anchor are possible and
    acceptable for this use); a final self-pair filter guards the
    degenerate id spaces where the skip wraps back onto the anchor (a
    1-id corpus has no valid negatives and yields zero pairs). An inner
    join back to the id set keeps
    only ids that exist, so sparse id spaces simply yield fewer pairs;
    dense 0..N-1 spaces (the common case for curated corpora) keep all
    ``k``. Plan shape: map-side k-way expansion, a 1-row max broadcast,
    and ONE keyed join against the (id-only) table — no global sort, no
    collect."""
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")
    # the id column feeds THREE consumers (max scalar, anchor expansion,
    # existence side); pin the single-column projection so the base is
    # scanned once, not three times
    id_only = df.select(id_col).transform(pin)
    n = id_only.agg((F.max(id_col) + 1).alias("_n"))
    a = id_only.withColumn(
        "neg_rank", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    key = F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("neg_rank"))
    cand = md5_bigint(key, seed=seed) % F.col("_n")
    with_cand = a.join(F.broadcast(n)).withColumn("_cand", cand)
    neg = F.when(
        F.col("_cand") == F.col(id_col), (F.col("_cand") + 1) % F.col("_n")
    ).otherwise(F.col("_cand"))
    ids = id_only.select(F.col(id_col).alias("_exists"))
    return (
        with_cand.withColumn("neg_id", neg)
        .where(F.col("neg_id") != F.col(id_col))
        .join(ids, F.col("neg_id") == F.col("_exists"), "left_semi")
        .select(id_col, "neg_rank", "neg_id")
    )


def curriculum_phases(
    df: DataFrame,
    score_col: str,
    *,
    weight_col: str | None = None,
    phases: int = 4,
) -> DataFrame:
    """Quantile-cut curriculum plan: bucket rows into ``phases`` ordered
    training phases by a quality score (phase 0 = top quantile, served
    first) and emit one summary row per phase: (phase, n_docs, n_weight,
    min_score, max_score).

    Why not ntile: a global NTILE is a single-partition window — the
    exact funnel the plan guards ban. Instead the cut points come from
    ONE exact percentile aggregate whose single row is collected to the
    driver (|phases|-1 doubles — the mixture_rates closed-form-scalar
    idiom) and re-embedded as literals, so the scoring projection is
    planned ONCE and the only data shuffle is the final per-phase
    aggregate. (A broadcast-join formulation would keep everything
    lazy but duplicate the upstream scoring subtree into both the
    scalar branch and the join branch — at corpus scale that is a
    second full tokenize-and-score pass.) Quantile interpolation
    (lower + (upper-lower) * frac) is bit-identical in Spark and DuckDB
    on identical doubles, so boundary docs land in the same phase in
    both engines.

    Rows with a NULL or NaN score are excluded (they cannot be ordered;
    filter or score them upstream — a NaN left in would skew the
    percentile cuts silently, since Spark orders NaN above every score).
    """
    if phases < 2:
        raise ValueError(f"phases must be >= 2, got {phases}")
    fracs = [i / phases for i in range(1, phases)]
    ok = F.col(score_col).isNotNull()
    if df.schema[score_col].dataType.simpleString() in ("float", "double"):
        ok = ok & ~F.isnan(score_col)
    # Only score and weight survive into the output: project to them and
    # pin the projection with a lazy checkpoint, so the cuts collect (the
    # first action) materializes the narrow (score, weight) stream once
    # and the final per-phase aggregate reads it back instead of
    # re-running the upstream scoring pipeline (a second full
    # tokenize-and-score pass at corpus scale).
    keep = [score_col] + (
        [weight_col] if weight_col and weight_col != score_col else []
    )
    scored = df.where(ok).select(*keep).transform(pin)
    cuts = scored.agg(
        F.expr(
            f"percentile({score_col}, array({', '.join(f'{f}D' for f in fracs)}))"
        ).alias("_qs")
    ).collect()[0]["_qs"]  # 1 row, phases-1 doubles
    if cuts is None:
        raise ValueError(
            "curriculum_phases: no rows with a non-NULL score — filter or "
            "score the corpus upstream before planning a curriculum"
        )
    # phase 0 = scores >= the top cut, descending from there
    expr = F.when(F.col(score_col) >= F.lit(cuts[phases - 2]), F.lit(0))
    for p in range(1, phases - 1):
        expr = expr.when(F.col(score_col) >= F.lit(cuts[phases - 2 - p]), F.lit(p))
    phase = expr.otherwise(F.lit(phases - 1))
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        scored.withColumn("phase", phase)
        .groupBy("phase")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(w).cast("bigint").alias("n_weight"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
        )
    )


def mixture_epoch_plan(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    weights: dict[str, float],
    *,
    budget_tokens: int,
    max_epochs: float = 2.0,
) -> DataFrame:
    """Epoch-capped mixture feasibility plan: for each stratum, how many
    tokens the target mixture wants (``budget * weight``), how many the
    corpus can supply under a repetition cap (``n_tokens * max_epochs``),
    and the shortfall. The pre-flight audit before mixture_sample: a
    mixture is only trainable if every deficit is zero — otherwise you
    either raise max_epochs (more repetition) or shrink the budget.

    One keyed aggregate (stratum cardinality rows) + a map-side CASE for
    the literal weights; integer token arithmetic after explicit floors,
    so every engine agrees exactly. Strata present in the data but absent
    from ``weights`` get weight 0 (desired 0, surplus corpus); weights
    naming absent strata raise — a typo'd mixture must fail loudly, not
    silently under-train a domain (the mixture_rates contract).
    """
    if budget_tokens <= 0 or max_epochs <= 0:
        raise ValueError(
            f"budget_tokens and max_epochs must be > 0, got {budget_tokens}, {max_epochs}"
        )
    # ONE corpus pass: the |strata|-row aggregate is checkpointed and
    # serves both the weights validation and the returned plan (the old
    # distinct().collect() presence probe was a second full scan).
    # n_tokens coalesces to 0 when every token count in a stratum is
    # NULL: SUM(all-NULL) is NULL, and F.least(desired, NULL) would
    # silently report the unsuppliable stratum as fully covered (Spark
    # least() skips NULLs) — deficit must equal desired instead.
    agg = (
        df.groupBy(stratum_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum(token_col).cast("bigint"), F.lit(0)).alias(
                "n_tokens"
            ),
        )
        # lazy: the presence-probe collect right below is the first
        # action and carries the materialization (one job, not two)
        .transform(pin)
    )
    present = {r[0] for r in agg.select(stratum_col).collect()}
    missing = sorted(set(weights) - present)
    if missing:
        raise ValueError(f"weights name strata absent from the data: {missing}")
    w = F.lit(0.0)
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(stratum_col) == s, F.lit(float(wt))).otherwise(w)
    desired = F.floor(F.lit(float(budget_tokens)) * F.col("weight")).cast("bigint")
    supply = F.floor(F.col("n_tokens").cast("double") * F.lit(float(max_epochs))).cast("bigint")
    return (
        agg.withColumn("weight", w)
        .withColumn("desired_tokens", desired)
        .withColumn("achievable_tokens", F.least(F.col("desired_tokens"), supply))
        .withColumn("deficit_tokens", F.col("desired_tokens") - F.col("achievable_tokens"))
        .withColumn(
            "epochs_needed",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("desired_tokens").cast("double") / F.col("n_tokens").cast("double"), 6),
            ),
        )
        .withColumn(
            "epochs_planned",
            F.when(
                F.col("n_tokens") > 0,
                F.least(F.lit(float(max_epochs)), F.col("epochs_needed")),
            ),
        )
    )
