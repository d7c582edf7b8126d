"""One-pass sketch operators for counts that would otherwise need a
full shuffle of the keys themselves.

At 100 TB, ``COUNT(DISTINCT user_id)`` shuffles every distinct key; a
HyperLogLog sketch shuffles at most ``m`` (e.g. 4096) small integers
per partition after a map-side partial max — the canonical
cardinality-at-scale operator (Flajolet et al. 2007, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm"; the same
structure behind Spark's own ``approx_count_distinct``).

Why not just ``F.approx_count_distinct``? Its HLL++ uses xxhash64 and
JVM-internal register encoding — unverifiable against another engine.
This implementation is **engine-portable and fully deterministic**:

- hash: a 32-bit xorshift-multiply finalizer (Wellons' "lowbias32")
  computed in exact signed-64 arithmetic — every product stays below
  2^63, so ``%``, ``*``, ``xor`` and ``>>`` restate verbatim in ANSI
  SQL with no overflow semantics to reconcile. A plain multiplicative
  hash (sampling.hash_bucket's Knuth constant) is NOT enough here:
  ``(id * odd) mod 2^32 mod m`` is a *bijection* on sequential ids for
  power-of-two ``m``, which yields zero register collisions and wrecks
  the estimator's independence assumptions (measured +24% at sf0.1);
  the xor-shift rounds are the nonlinearity that restores Poisson-like
  collisions;
- register index = ``h % m``; rank ``rho`` = leading-zero count of the
  remaining ``32 - p`` bits + 1, computed as bit-LENGTH arithmetic over
  ``bin()`` strings (exact integers, no float log2 — same idiom as
  textstats.length_histogram);
- the harmonic-mean denominator ``sum(2^-rho)`` is accumulated as the
  exact integer ``sum(2^(R - rho))`` (R = max possible rank), so the
  final estimate is ONE double division of two exact integers —
  bit-identical in any IEEE-754 engine, no order-of-summation drift.

So unlike every stock implementation, the *estimate itself* (bias
correction and linear-counting branch included) hash-matches a DuckDB
restatement — the driver's oracle gate checks the approximation, not
just a row count.

Scale shape: one partial-agg shuffle of at most ``m`` (bucket, rho)
rows per map partition; output O(m) rows -> 1 row. No window, no UDF,
no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from db_loganalyzer_spark.operators.sampling import M32

# lowbias32 multipliers (Wellons, "Prospecting for Hash Functions"):
# both < 2^31, so (h % 2^32) * c < 2^63 — exact in any signed-64 engine.
_MIX_C1 = 0x21F0AAAD  # 569_354_925
_MIX_C2 = 0x735A2D97  # 1_935_093_143


def mix32(c: Column | str, salt: int = 0) -> Column:
    """Engine-portable 32-bit avalanche hash of an integer column.

    lowbias32: ``x ^= x>>16; x *= c1; x ^= x>>15; x *= c2; x ^= x>>15``
    with every step reduced mod 2^32. Uses only ``% * ^ >>`` over
    non-negative signed-64 values, restatable verbatim in DuckDB SQL.
    """
    col = F.col(c) if isinstance(c, str) else c
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # id would sign-extend through the xor/shift stages and diverge
    # from the Python reference (whose % is always non-negative). Only
    # the first reduction needs it — every later stage's dividend is
    # already non-negative.
    h = F.pmod(col.cast("long") + salt, F.lit(M32))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = (h * _MIX_C1) % M32
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = (h * _MIX_C2) % M32
    h = h.bitwiseXOR(F.shiftright(h, 15))
    return h


def mix32_sql(expr: str, salt: int = 0) -> str:
    """The DuckDB restatement of :func:`mix32` over ``expr`` as ONE
    inline expression — kept next to the Spark form so the two can't
    drift. Each xor stage substitutes the accumulated string twice, so
    the text (and, absent CSE, the evaluation) grows 2^3-fold: use this
    for literals and tiny test inputs; table-scale oracles should go
    through :func:`mix32_sql_select`, which stages the mixer through
    nested selects at linear cost."""
    h = f"(((({expr}) + {salt}) % 4294967296 + 4294967296) % 4294967296)"
    h = f"xor({h}, {h} >> 16)"
    h = f"(({h} * {_MIX_C1}) % 4294967296)"
    h = f"xor({h}, {h} >> 15)"
    h = f"(({h} * {_MIX_C2}) % 4294967296)"
    h = f"xor({h}, {h} >> 15)"
    return h


def mix32_sql_select(
    expr: str,
    from_sql: str,
    passthrough: list[str] | None = None,
    alias: str = "h",
    salt: int = 0,
) -> str:
    """Linear-cost DuckDB restatement of :func:`mix32`: a nested-select
    chain where every stage references the previous stage's COLUMN (no
    expression-tree duplication — each mixer step is evaluated exactly
    once per row). Returns a parenthesized subquery selecting
    ``passthrough`` columns plus the hash as ``alias``; embed it in a
    FROM clause. Bit-identical to mix32/mix32_sql (pinned in tests).
    """
    cols = ", ".join(passthrough or [])
    pre = f"{cols}, " if cols else ""
    stages = [
        f"(((({expr}) + {salt}) % 4294967296 + 4294967296) % 4294967296) AS h0",
        "xor(h0, h0 >> 16) AS h1",
        f"((h1 * {_MIX_C1}) % 4294967296) AS h2",
        "xor(h2, h2 >> 15) AS h3",
        f"((h3 * {_MIX_C2}) % 4294967296) AS h4",
        f"xor(h4, h4 >> 15) AS {alias}",
    ]
    sql = from_sql
    for st in stages:
        sql = f"(SELECT {pre}{st} FROM {sql})"
    return sql


def _hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_rank(c: Column | str, p: int, salt: int = 0) -> Column:
    """(bucket, rho) pair packed as a struct for an integer key column.

    ``h`` spreads the key over 32 bits; the low ``p`` bits select the
    register, the high ``32 - p`` bits feed the leading-zero rank:
    ``rho = (32 - p) - bitlen(v) + 1`` (``v == 0`` -> maximal rank).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    m = 1 << p
    width = 32 - p
    h = mix32(c, salt)
    bucket = (h % m).cast("int")
    v = ((h - h % m) / m).cast("long")  # exact floor div: h < 2^32
    rho = F.when(v == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(v)) + 1
    )
    return F.struct(bucket.alias("bucket"), rho.cast("int").alias("rho"))


def hll_registers(
    df: DataFrame, key_col: str, p: int = 12, salt: int = 0
) -> DataFrame:
    """Register table ``(bucket, rho)`` — max rank seen per register.

    One partial-agg shuffle: map-side max collapses each input partition
    to <= m rows before the exchange, so shuffle volume is O(m x
    partitions) regardless of row count. Null keys are excluded (a NULL
    contributes nothing to a distinct count).
    """
    pair = hll_rank(key_col, p, salt)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pair.getField("bucket").alias("bucket"), pair.getField("rho").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_finish(
    regs: DataFrame, p: int = 12, group_cols: list[str] | None = None
) -> DataFrame:
    """Finish a ``(group_cols..., bucket, rho)`` register table into one
    estimate row per group — the merge/finalize half of the sketch,
    shared by the batch operator and the streaming windowed form (the
    registers are the mergeable state; this is pure batch math over
    <= m rows per group).

    ``S = sum over ALL m registers of 2^(R - rho)`` (empty registers
    have rho = 0 -> contribute 2^R) is an exact BIGINT: R <= 29, m <=
    65536, so S <= 2^45. Raw estimate = ``alpha * m^2 * 2^R / S`` — one
    double division of exact integers. Small-range (linear counting)
    branch when raw <= 2.5m and zero registers exist: ``m * ln(m/V)``;
    the single ``ln`` call is the one library function in the operator,
    rounded to 6 decimals to absorb sub-ulp engine drift.
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    big_r = 32 - p + 1
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), big_r - F.col("rho")).cast("long")).alias(
            "__s_nonzero"
        ),
        F.count(F.lit(1)).alias("__nz"),
    )
    # empty registers: rho = 0 -> each contributes 2^R exactly
    s = (F.col("__s_nonzero") + (m - F.col("__nz")) * (1 << big_r)).cast(
        "long"
    )
    zeros = (F.lit(m) - F.col("__nz")).cast("long")
    alpha = _hll_alpha(m)
    raw = F.lit(alpha * m * m * float(1 << big_r)) / s.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols,
        F.lit(m).cast("bigint").alias("m"),
        F.col("__nz").cast("bigint").alias("nonzero_registers"),
        s.alias("scaled_sum"),
        F.round(est, 6).alias("estimate"),
    )


def hll_estimate(
    df: DataFrame, key_col: str, p: int = 12, salt: int = 0
) -> DataFrame:
    """One-row HLL cardinality estimate (see :func:`hll_finish`)."""
    return hll_finish(hll_registers(df, key_col, p, salt), p)


def hll_estimate_grouped(
    df: DataFrame,
    key_col: str,
    group_by: list[str],
    p: int = 12,
    salt: int = 0,
) -> DataFrame:
    """Per-group HLL distinct estimate — the scale form of
    ``GROUP BY g, COUNT(DISTINCT k)``, which shuffles every distinct
    (g, k) pair; this shuffles <= m register rows per group per map
    partition (map-side max combine), then finishes each group's <= m
    rows with the shared :func:`hll_finish` math."""
    pair = hll_rank(key_col, p, salt)
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *group_by,
            pair.getField("bucket").alias("bucket"),
            pair.getField("rho").alias("rho"),
        )
        .groupBy(*group_by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_finish(regs, p, group_by)


def hll_cumulative(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    p: int = 12,
    salt: int = 0,
) -> DataFrame:
    """Cumulative distinct-count curve: one estimate row per time
    bucket of the distinct ``key_col`` values seen **up to and
    including** that bucket — the "unique users over time" growth curve.

    The exact form is brutal at scale (each bucket's cumulative
    distinct re-deduplicates all history — either an O(buckets x keys)
    self-join or a giant first-seen shuffle). HLL registers make it one
    running ``max``: registers are mergeable by pointwise max, so the
    cumulative register table at bucket ``b`` is ``max`` over buckets
    ``<= b`` — a window over a frame whose size is **sketch-bounded**
    (<= m registers x buckets, independent of row count).

    Plan: per-(bucket-of-time, register) partial-max shuffle (the only
    data-sized pass), dense bucket x register grid via a broadcast
    cross join of two tiny distinct frames, running max per register
    ordered by time, then the shared :func:`hll_finish` per bucket.
    """
    us = F.unix_micros(F.col(ts_col))
    bkt = F.floor(us / F.lit(float(bucket_seconds) * 1e6)).cast("long")
    pair = hll_rank(key_col, p, salt)
    sparse = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            bkt.alias("bkt"),
            pair.getField("bucket").alias("bucket"),
            pair.getField("rho").alias("rho"),
        )
        .groupBy("bkt", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    bkts = sparse.select("bkt").distinct()
    regs = sparse.select("bucket").distinct()
    grid = bkts.crossJoin(F.broadcast(regs))
    run = (
        Window.partitionBy("bucket")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dense = (
        grid.join(sparse, ["bkt", "bucket"], "left")
        .withColumn("rho", F.max("rho").over(run))
        .filter(F.col("rho").isNotNull())
    )
    return hll_finish(dense, p, ["bkt"])


def _cm_depth_buckets(hash_col: str, depth: int, width: int):
    """The (d, bucket) assignment both the sketch BUILD and the probe
    side must share bit-for-bit: row d uses the lowbias32 mixer with
    salt ``d*10007+1``. Single definition on purpose — a build/probe
    drift here produces silently wrong frequencies, not an error."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    (mix32(F.col(hash_col), salt=d * 10007 + 1) % width)
                    .cast("int")
                    .alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    )


def countmin_sketch(
    df: DataFrame, hash_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch build: ``(d, bucket, cnt)`` counters, at most
    ``depth * width`` rows whatever the input size. ``hash_col`` is an
    integer column (hash strings first — e.g. textstats._token_hash);
    row d uses the lowbias32 mixer with salt d*10007+1, so the depth
    hash functions are avalanche-independent yet restatable in SQL.

    Scale: the ONE shuffle is a partial agg whose map-side output is
    bounded by depth*width counters per partition — the fixed-size
    frequency summary that replaces a full per-key groupBy when only
    heavy-hitter screening is needed. Estimates are deterministic
    (structure + data, no RNG), so they hash-match a SQL restatement:
    a verified approximation, same doctrine as the HLL entry.
    """
    rows = df.select(_cm_depth_buckets(hash_col, depth, width).alias("c"))
    return (
        rows.groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_estimates(
    df: DataFrame,
    keys: DataFrame,
    hash_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates ``est = min over d of sketch[d][h_d(k)]``
    for each probe row in ``keys`` (same ``hash_col`` convention). The
    probe side explodes to its depth buckets, equi-joins the (tiny,
    broadcastable) sketch, and takes one min per key — the sketch is
    built once however many keys are probed. Overestimates only, by
    the classic eps = e/width bound per row of depth."""
    sketch = countmin_sketch(df, hash_col, depth, width)
    probe = keys.select(
        "*", _cm_depth_buckets(hash_col, depth, width).alias("c")
    ).select("*", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    key_cols = [c for c in keys.columns]
    return (
        probe.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(*key_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_by: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = 256,
) -> DataFrame:
    """Approximate per-group quantiles from a fixed-bin histogram — the
    sort-free percentile at scale. Exact ``percentile`` sorts every
    group's values; this makes two aggregation passes (min/max/count,
    then bin counts), both two-phase map-side-combined, and the
    estimate interpolates inside the target bin over <= ``bins`` rows
    per group. Worst-case error is one bin width.

    Every arithmetic step is IEEE +,-,*,/ and floor/ceil over exact
    inputs — all correctly-rounded, bit-identical in any IEEE-754
    engine — so unlike t-digest/GK sketches (merge-order-dependent)
    this estimator is deterministic and oracle-checkable, no rounding
    fudge needed. Emits ``(group..., q, n, est)``.
    """
    if not 0 < len(quantiles):
        raise ValueError("need at least one quantile")
    for q in quantiles:
        # q = 0 would make target = ceil(0*n) = 0 and the pick filter
        # unsatisfiable — the quantile silently vanishes from the
        # output. Reject it (use min() for q=0) rather than emit less
        # than the caller asked for.
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(
                f"quantile {q!r} outside (0, 1]; use an explicit "
                "min() aggregate for q=0"
            )
    base = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    )
    stats = base.groupBy(*group_by).agg(
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    v = F.col(value_col)
    width_frac = (v - F.col("__lo")) / (F.col("__hi") - F.col("__lo"))
    bin_ix = F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(width_frac * bins).cast("long"), F.lit(bins - 1)
        )
    )
    counts = (
        base.join(F.broadcast(stats), group_by)
        .groupBy(*group_by, bin_ix.alias("__bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.first("__lo").alias("__lo"),
            F.first("__hi").alias("__hi"),
            F.first("__n").alias("__n"),
        )
    )
    w = (
        Window.partitionBy(*group_by)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("__cum", F.sum("__cnt").over(w))
    qs = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("q")
    picked = (
        cum.select(*group_by, "__bin", "__cnt", "__lo", "__hi", "__n", "__cum", qs)
        .withColumn("__target", F.ceil(F.col("q") * F.col("__n")).cast("long"))
        .filter(
            (F.col("__cum") >= F.col("__target"))
            & ((F.col("__cum") - F.col("__cnt")) < F.col("__target"))
        )
    )
    est = F.when(
        F.col("__hi") == F.col("__lo"), F.col("__lo")
    ).otherwise(
        F.col("__lo")
        + ((F.col("__hi") - F.col("__lo")) / bins)
        * (
            F.col("__bin")
            + (
                (F.col("__target") - (F.col("__cum") - F.col("__cnt")))
                / F.col("__cnt")
            )
        )
    )
    return picked.select(
        *group_by,
        "q",
        F.col("__n").alias("n"),
        est.alias("est"),
    )


def hll_overlap(
    df: DataFrame,
    key_col: str,
    label_col: str,
    label_a: str,
    label_b: str,
    p: int = 12,
    salt: int = 0,
) -> DataFrame:
    """A32 — sketch-side set algebra: estimated |A|, |B|, |A u B| and
    (by inclusion-exclusion) |A n B| + Jaccard for the key sets of two
    label values — "how much do error users overlap purchase users"
    without ever shuffling a distinct (label, key) pair set.

    Registers are mergeable by pointwise max, so the union sketch is
    one more groupBy over the two label sketches ALREADY built — total
    cost three register tables of <= 2^p rows each. The exact form at
    scale needs a full-key shuffle AND a self-join; this needs neither.
    Inclusion-exclusion inherits the individual estimates' error (for
    small overlaps the relative error can exceed 100% — the standard
    HLL caveat, which the in-row exact columns at test SF make visible).
    """
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(label_col).isin([label_a, label_b])
    ).select(F.col(label_col).alias("__l"), F.col(key_col).alias("__k"))
    pair = hll_rank("__k", p, salt)
    per_label = (
        base.select(
            "__l",
            pair.getField("bucket").alias("bucket"),
            pair.getField("rho").alias("rho"),
        )
        .groupBy("__l", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est_ab = hll_finish(per_label, p, ["__l"]).select(
        "__l", F.col("estimate")
    )
    est_u = hll_finish(
        per_label.groupBy("bucket").agg(F.max("rho").alias("rho")), p
    ).agg(
        # global aggs guarantee ONE row even when a label (or both) has
        # zero input rows — an absent set is estimate 0, not zero rows
        # (a silent no-output would read as "no overlap data")
        F.coalesce(F.first("estimate"), F.lit(0.0)).alias("est_union")
    )
    ea = (
        est_ab.filter(F.col("__l") == label_a)
        .agg(F.coalesce(F.first("estimate"), F.lit(0.0)).alias("est_a"))
    )
    eb = (
        est_ab.filter(F.col("__l") == label_b)
        .agg(F.coalesce(F.first("estimate"), F.lit(0.0)).alias("est_b"))
    )
    out = ea.crossJoin(eb).crossJoin(est_u)
    inter = F.greatest(
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 6),
        F.lit(0.0),
    )
    return out.select(
        F.lit(label_a).alias("label_a"),
        F.lit(label_b).alias("label_b"),
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersection"),
        F.when(
            F.col("est_union") > 0, F.round(inter / F.col("est_union"), 6)
        ).alias("jaccard_est"),
    )
