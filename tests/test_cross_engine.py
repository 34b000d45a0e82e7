"""Cross-engine scalar parity: the driver's gate hashes values
float-exactly, so every float that crosses a gate must be bit-identical
between Spark (JVM Math) and DuckDB (C libm).  Integer-scaled gates
(floor/div idioms) only guarantee that when the underlying scalar
functions agree to well below the scaling grid; these tests pin the
agreement on the exact value ranges our gates use, so a platform/libm
drift shows up HERE instead of as a red driver row.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F


def _spark_vals(spark, expr_sql: str, n: int):
    return [
        r["v"]
        for r in spark.range(1, n + 1)
        .select(F.expr(expr_sql).alias("v"))
        .collect()
    ]


def _duck_vals(expr_sql: str, n: int):
    con = duckdb.connect()
    return [
        r[0]
        for r in con.sql(
            f"SELECT {expr_sql} AS v FROM range(1, {n + 1}) t(id) ORDER BY id"
        ).fetchall()
    ]


def test_ln_parity_within_one_ulp(spark):
    """MEASURED CONTRACT: Spark's ln (java.lang.Math.log, <=1 ulp by
    spec) disagrees with DuckDB's correctly-rounded libm ln on ~1% of
    integer inputs — by EXACTLY one ulp, never more.  Every floor/
    round-scaled gate's margin budget is derived from this bound, so
    pin it: a platform where the divergence exceeds 1 ulp invalidates
    those budgets and must fail loudly here."""
    n = 20000
    s = _spark_vals(spark, "ln(cast(id AS double))", n)
    d = _duck_vals("ln(CAST(id AS DOUBLE))", n)
    worst = 0.0
    n_diff = 0
    for a, b in zip(s, d):
        if a != b:
            n_diff += 1
            worst = max(worst, abs(a - b) / math.ulp(a))
    assert worst <= 1.0, f"ln diverges by {worst} ulps"
    # sanity: the engines DO differ (if a runtime change made them
    # bit-identical, the margin machinery is over-engineered — worth
    # noticing either way)
    assert n_diff < n * 0.05


def test_pow_parity_within_one_ulp(spark):
    """pow(0.8, k) for the EWMA exponent range: <= 1 ulp divergence
    (observed: 3 of 32 exponents differ by exactly 1 ulp)."""
    s = _spark_vals(spark, "power(0.8D, cast(id AS double))", 31)
    d = _duck_vals("power(0.8, CAST(id AS DOUBLE))", 31)
    for a, b in zip(s, d):
        assert abs(a - b) <= math.ulp(max(abs(a), abs(b)))


def test_sqrt_and_division_parity(spark):
    """sqrt and double division (stddev/ratio idioms) over the integer
    grid — IEEE 754 requires both correctly rounded, so any mismatch
    means an engine is off-spec (worth knowing immediately)."""
    n = 10000
    assert _spark_vals(spark, "sqrt(cast(id AS double))", n) == _duck_vals(
        "sqrt(CAST(id AS DOUBLE))", n
    )
    assert _spark_vals(
        spark, "cast(id AS double) / 7.0D", n
    ) == _duck_vals("CAST(id AS DOUBLE) / 7.0", n)


def test_integer_div_scaling_parity(spark):
    """The rate_e6/lift_e6 gate idiom — (a * 10^6) div b — is pure
    bigint math on both engines; pin a range including exact-quotient
    boundaries (b divides a*10^6) where a float formulation would be
    one ulp from flipping."""
    n = 5000
    s = _spark_vals(
        spark, "(cast(id AS bigint) * 1000000) div 4096", n
    )
    d = _duck_vals("(CAST(id AS BIGINT) * 1000000) // 4096", n)
    assert s == d


def test_floor_scaled_entropy_margin():
    """For the ACTUAL sf0.01 documents, the entropy_e3 gate value must
    sit far from its floor grid boundary: recompute H in Python libm
    and assert the fractional distance to the grid exceeds 1e-8 —
    ~100x the cross-engine ulp budget, yet small enough that a random
    testdata regeneration has ~1e-5 odds of a false alarm."""
    import collections

    con = duckdb.connect()
    rows = con.sql(
        "SELECT text FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall()
    assert rows
    worst = 1.0
    for (text,) in rows:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        c = collections.Counter(toks)
        n = len(toks)
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        frac = (h * 1000.0) % 1.0
        worst = min(worst, frac, 1.0 - frac)
    assert worst > 1e-8, f"entropy too close to floor grid: {worst}"


@pytest.mark.slow
def test_avg_parity_is_not_assumed(spark):
    """Documents the KNOWN non-parity: avg over doubles is
    order-dependent, so gates never hash a raw double mean — verify the
    engines CAN disagree at the ulp level on a permuted sum, proving
    the floor/round-scaled discipline is load-bearing, not paranoia."""
    # 1/3 + 1/7 + ... in different orders differ in the last ulp;
    # this asserts our assumption that raw float aggregates are unsafe
    # (if summation everywhere were exact, the discipline would be
    # unnecessary — either way the test documents the contract).
    vals = [1.0 / k for k in range(1, 1000)]
    fwd = sum(vals)
    rev = sum(reversed(vals))
    assert fwd != rev or math.fsum(vals) not in (fwd, rev)


def test_floor_scaled_ewma_margin():
    """For the ACTUAL sf0.01 orders, every month's EWMA value must sit
    far from its floor-dollar boundary: the cross-engine error budget
    is ~31 combined pow/sum ulps (~1e-7 absolute on ~1e6 dollar
    values); require margin > 1e-5 — 100x wider, while keeping the
    false-alarm odds on regenerated data ~1e-3."""
    con = duckdb.connect()
    rows = con.sql(
        """
        WITH d AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) m,
                   CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) rev
            FROM '/root/testdata/sf0.01/orders.parquet' GROUP BY m, day
        ),
        r AS (SELECT m, rev,
                     row_number() OVER (PARTITION BY m ORDER BY day) rn,
                     count(*) OVER (PARTITION BY m) nd
              FROM d)
        SELECT m, 0.2 * sum(power(0.8, nd - rn) * rev) FROM r GROUP BY m
        """
    ).fetchall()
    assert rows
    worst = 1.0
    for _, y in rows:
        frac = y % 1.0
        worst = min(worst, frac, 1.0 - frac)
    assert worst > 1e-5, f"EWMA too close to floor grid: {worst}"


def test_floor_scaled_nll_margin():
    """lm_perplexity's avg_nll_e3 gate on the ACTUAL sf0.01 documents:
    per-doc mean negative log-likelihood must clear its 1e-3 floor grid
    by > 1e-7 (budget: ~n_bigrams ln ulps ~ 1e-12)."""
    import collections

    con = duckdb.connect()
    texts = [
        t for (t,) in con.sql(
            "SELECT text FROM '/root/testdata/sf0.01/documents.parquet'"
        ).fetchall()
    ]
    grams, c_x, vocab = collections.Counter(), collections.Counter(), set()
    docs = []
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        vocab.update(toks)
        bg = list(zip(toks, toks[1:]))
        docs.append(bg)
        grams.update(bg)
        c_x.update(w for w, _ in bg)
    v = float(len(vocab))
    worst = 1.0
    for bg in docs:
        if not bg:
            continue
        nll = [-math.log((grams[g] + 1) / (c_x[g[0]] + v)) for g in bg]
        y = (sum(nll) / len(nll)) * 1000.0
        frac = y % 1.0
        worst = min(worst, frac, 1.0 - frac)
    assert worst > 1e-7, f"avg_nll too close to floor grid: {worst}"
