"""Mergeable frequency sketches — the bounded-memory complement to the
exact counting paths.

`ngram_topk` (queries/corpus_pipeline.py) counts terms exactly with a
two-phase agg: right when the distinct-term universe fits a shuffle, wrong
at web scale where the unigram+bigram vocabulary of a 100 TB crawl is
itself tens of TB.  The count-min sketch (Cormode & Muthukrishnan, J.
Algorithms 2005) bounds the state instead: ``depth`` hash rows of
``width`` counters — the memory is a CHOICE, like the Bloom filter's
``m`` (operators/dedup.py:bloom_filter_dedup) — at the cost of
one-sided error: estimates only ever OVERCOUNT (collisions add), by at
most ``2N/width`` with probability ``1 - 2^-depth``.

Relational representation: the sketch IS a ``(row, col, cnt)`` DataFrame
of at most ``depth * width`` rows — built by one map-side-combined
groupBy, merged across corpora/shards by summing cells (the property that
makes it a streaming/partial-agg citizen), and probed by a broadcast
join + per-term MIN.  Hashes are the engine-portable md5-derived 60-bit
family, so DuckDB oracles compute identical cells and the "approximate"
answer is value-exact across engines.

Reference analogue: the approx-agg family (approx_count_distinct /
approx_percentile ride Spark's built-in sketches); this adds the
frequency sketch those builtins lack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex15(col: Column) -> Column:
    """First 15 hex chars of md5 as a 60-bit BIGINT — the portable hash
    family (DuckDB twin emitted by queries/extensions.py:_sql_hex15)."""
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def _cms_h1h2(term: Column, width: int) -> tuple[Column, Column]:
    """Kirsch–Mitzenmacher double hashing (the same scheme as
    operators/dedup.py:bloom_positions): row ``r``'s counter column is
    ``(h1 + r*h2) mod width`` from TWO md5-derived hashes instead of one
    md5 per row — ``depth`` can grow without more hashing, and
    whole-stage codegen's common-subexpression elimination computes the
    two md5s once per term across all ``depth`` struct fields.  ``h2``
    is folded into [1, width-1] so the stride is never zero."""
    h1 = _hex15(F.concat(F.lit("cms:"), term)) % width
    h2 = (_hex15(F.concat(F.lit("cmsb:"), term)) % (width - 1)) + 1
    return h1, h2


def _cells_frame(
    df: DataFrame,
    term_col: str,
    width: int,
    depth: int,
    carry: list[str],
) -> DataFrame:
    """``(carry..., row, col)`` sketch cells of every term — the ONE cell
    derivation both build and probe use, so their hashing can never
    desynchronize (the >=-true-count guarantee depends on them agreeing).

    h1/h2 are materialized in their OWN projection before the explode:
    the Generate node does not common-subexpression-eliminate, so
    inlining them would re-evaluate both md5s in every one of the
    ``depth`` struct fields (2*depth md5s per term — measured 3x slower
    than this two-stage shape, which computes exactly two)."""
    h1, h2 = _cms_h1h2(F.col(term_col), width)
    hv = df.select(
        *[F.col(c) for c in carry], h1.alias("_h1"), h2.alias("_h2")
    )
    return hv.select(
        *[F.col(c) for c in carry],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        ((F.col("_h1") + r * F.col("_h2")) % width).alias(
                            "col"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(*carry, "_c.row", "_c.col")


def count_min_build(
    df: DataFrame,
    term_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch over a term stream: every term increments one
    counter per hash row.  Returns ``(row, col, cnt)`` — at most
    ``depth * width`` rows regardless of corpus size.

    Scale shape: explode ``depth`` cells per term (map-only), then ONE
    map-side-combined groupBy onto the bounded cell space — partial
    aggregation does almost all the work executor-local because the
    key space is tiny.  Two sketches merge by unioning and re-summing
    cells; a streaming job updates it per micro-batch the same way.
    """
    cells = _cells_frame(df, term_col, width, depth, carry=[])
    return cells.groupBy("row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimate each probe term's frequency: MIN over its ``depth``
    counters (missing cell = 0).  Guarantees ``estimate >= true count``
    — collisions only ever add — PROVIDED width/depth match the build
    call; a mismatch would probe never-populated cells and undercount,
    so the common mismatches fail fast below.

    Scale shape: probes explode to ``depth`` cells and join the sketch;
    the sketch side is <= depth*width rows — broadcast it, never shuffle
    the probe stream to meet a bounded table."""
    # fail fast on parameter drift: a non-empty sketch populates every
    # hash row 0..built_depth-1, and its cols live in [0, built_width).
    # Catches probe depth < built depth and probe width < built width
    # (built cells out of probe range); the inverse mismatches are not
    # relationally detectable — callers own the params, this is a guard.
    bounds = sketch.agg(
        F.count_distinct(F.col("row")).alias("_d"),
        F.max(F.col("col")).alias("_maxc"),
    ).collect()[0]
    if bounds["_d"] and bounds["_d"] != depth:
        raise ValueError(
            f"sketch was built with depth={bounds['_d']}, probed with "
            f"depth={depth} — estimates would undercount"
        )
    if bounds["_maxc"] is not None and bounds["_maxc"] >= width:
        raise ValueError(
            f"sketch has cols up to {bounds['_maxc']} but probe "
            f"width={width} — width mismatch would undercount"
        )
    pc = _cells_frame(probes, term_col, width, depth, carry=[term_col])
    return (
        pc.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# --- HyperLogLog-style distinct sketch -------------------------------------

#: register exponent cap: rho values above 40 collapse to 40.  2^-40
#: contributions are ~1e-12 of an empty register's weight, far below the
#: estimator's intrinsic ~1.04/sqrt(m) error, and the cap keeps the
#: integer register weights 2^(50-rho) exact in a BIGINT (no floating
#: sum whose addition ORDER could differ between engines).
_HLL_RHO_CAP = 40
_HLL_SCALE = 50  # register weight = 2^(_HLL_SCALE - rho), summed exactly


def hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m >= 128."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(df: DataFrame, col: str, p: int = 8) -> DataFrame:
    """Register frame of the HyperLogLog sketch (Flajolet, Fusy,
    Gandouet & Meunier, AofA 2007) over a value stream: ``2^p``
    registers, each the MAX over its bucket of rho(w) = 1-based
    position of the lowest set bit of the non-bucket hash bits.

    Returns ``(bucket, m_j)`` — at most ``2^p`` rows regardless of
    input size; sketches merge by unioning and re-MAXing registers
    (the same partial-agg/streaming citizenship as the count-min
    sketch above).  The bounded-memory complement to COUNT(DISTINCT):
    exact distinct state is the value universe itself (TBs for a web
    crawl's vocabulary); the sketch is 2^p rows by CHOICE.

    Determinism: the md5-derived 60-bit hash splits into bucket
    (low p bits via % m) and w (h >> p); rho is computed with integer
    bit arithmetic (``length(bin(w & -w))``) — no floats anywhere, so
    a DuckDB oracle computes identical registers.
    """
    m = 1 << p
    h = _hex15(F.concat(F.lit("hll:"), F.col(col).cast("string")))
    w = F.shiftright(h, p)
    lsb = w.bitwiseAND(-w)
    rho = F.when(w == F.lit(0), F.lit(_HLL_RHO_CAP)).otherwise(
        F.least(F.length(F.bin(lsb)), F.lit(_HLL_RHO_CAP))
    )
    return (
        df.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row raw-HLL estimate from a register frame: ``alpha_m * m^2
    / sum_j 2^(-M_j)`` with empty registers filled in from a generated
    spine (M_j = 0).

    The harmonic sum is computed EXACTLY: each register contributes the
    integer ``2^(50 - M_j)`` (rho capped at 40), so ``s_scaled`` is a
    BIGINT no summation order can perturb, and the estimate is one
    double division of literal-folded constants — bit-identical across
    engines.  ``est_raw`` is the uncorrected estimator; ``est`` applies
    the Flajolet §4 small-range linear-counting correction
    (``m*ln(m/V)`` when raw <= 2.5m and empty registers remain) — do
    NOT re-apply it.  ``nonzero_regs`` is emitted so callers that want
    a different correction regime can compute their own from
    ``est_raw``.  ln()'s last ulp is the one cross-libm hazard; the
    1e-2 output rounding in the registry entry absorbs it.
    """
    m = 1 << p
    spark = registers.sparkSession
    spine = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    mm = spine.join(F.broadcast(registers), "bucket", "left").select(
        F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j")
    )
    # SQL form: the python F.shiftleft wrapper takes a literal int bit
    # count, but the shift here is per-row (50 - m_j)
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SCALE} - m_j)")
    agg = mm.agg(
        F.sum(weight).alias("s_scaled"),
        F.sum((F.col("m_j") == 0).cast("long")).alias("zeros"),
    )
    num = hll_alpha(m) * m * m * float(1 << _HLL_SCALE)
    raw = F.lit(num) / F.col("s_scaled")
    # Flajolet et al. §4 small-range correction: linear counting
    # m*ln(m/V) when the raw estimate is <= 2.5m and empty registers
    # remain.  ln() is the one operation here whose last ulp is not
    # formally pinned across libms; the 1e-2 output rounding absorbs it.
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m).cast("long") - F.col("zeros")).alias("nonzero_regs"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
        raw.alias("est_raw"),
        corrected.alias("est"),
    )


def hll_build_by(
    df: DataFrame, col: str, keys: "list[str]", p: int = 8
) -> DataFrame:
    """Per-group HLL registers: ``(*keys, bucket, m_j)`` — at most
    ``n_groups * 2^p`` rows.  The GROUP BY citizenship is the whole point
    of a mergeable sketch: one two-phase aggregation computes an
    approximate COUNT(DISTINCT) per group with bounded state per group,
    where exact per-group distinct state is each group's value universe.
    Same deterministic integer register arithmetic as :func:`hll_build`
    (bit-identical in DuckDB)."""
    m = 1 << p
    h = _hex15(F.concat(F.lit("hll:"), F.col(col).cast("string")))
    w = F.shiftright(h, p)
    lsb = w.bitwiseAND(-w)
    rho = F.when(w == F.lit(0), F.lit(_HLL_RHO_CAP)).otherwise(
        F.least(F.length(F.bin(lsb)), F.lit(_HLL_RHO_CAP))
    )
    return (
        df.select(*keys, (h % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate_by(
    registers: DataFrame, keys: "list[str]", p: int = 8
) -> DataFrame:
    """Per-group estimates from :func:`hll_build_by` registers:
    ``(*keys, m, nonzero_regs, s_scaled, est_raw, est)`` — one row per
    group, with the same exact-integer harmonic sum and Flajolet §4
    small-range correction as :func:`hll_estimate` (``est`` IS
    corrected; do not re-apply).  The empty-register spine is the
    distinct-groups frame cross-joined with ``2^p`` bucket ids —
    n_groups * m rows, never the data."""
    m = 1 << p
    spark = registers.sparkSession
    spine = (
        registers.select(*keys)
        .distinct()
        .crossJoin(
            spark.range(m).select(F.col("id").cast("long").alias("bucket"))
        )
    )
    mm = spine.join(registers, [*keys, "bucket"], "left").select(
        *keys, F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j")
    )
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_SCALE} - m_j)")
    agg = mm.groupBy(*keys).agg(
        F.sum(weight).alias("s_scaled"),
        F.sum((F.col("m_j") == 0).cast("long")).alias("zeros"),
    )
    num = hll_alpha(m) * m * m * float(1 << _HLL_SCALE)
    raw = F.lit(num) / F.col("s_scaled")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return agg.select(
        *keys,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m).cast("long") - F.col("zeros")).alias("nonzero_regs"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
        raw.alias("est_raw"),
        corrected.alias("est"),
    )
