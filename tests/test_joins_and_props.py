"""Join-strategy helpers + hypothesis property tests for the upsert and
validation invariants (SURVEY §5.2 property-based checks)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
    broadcast_join,
    salted_join,
)
from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.upsert import (
    upsert_keep_last,
)


def test_broadcast_join_plan_has_no_fact_shuffle(spark):
    fact = spark.range(0, 10000).withColumn("k", F.col("id") % 10)
    dim = spark.range(0, 10).withColumnRenamed("id", "k").withColumn(
        "name", F.concat(F.lit("d"), F.col("k"))
    )
    out = broadcast_join(fact, dim, ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 10000


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows share one hot key — the salted join must produce
    # exactly the same multiset of rows as a plain join.
    fact = spark.range(0, 5000).withColumn(
        "k", F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100)
    )
    dim = spark.range(0, 100).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 10
    )
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k", salt_buckets=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


@st.composite
def keyed_rows(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    return [
        (
            draw(st.integers(min_value=0, max_value=5)),
            draw(st.integers(min_value=0, max_value=100)),
        )
        for _ in range(n)
    ]


@settings(max_examples=12, deadline=None)
@given(existing=keyed_rows(), batch=keyed_rows())
def test_upsert_properties(spark, existing, batch):
    """For any existing table and batch: (1) result is unique per key,
    (2) every batch key carries the batch's winning value, (3) non-batch
    keys keep the existing winner, (4) replay is a no-op."""
    sch = "k long, v long"
    e = spark.createDataFrame(existing, sch) if existing else None
    if e is not None:
        # normalize existing to unique-per-key (table invariant)
        e = upsert_keep_last(None, e, ["k"], [F.col("v").desc()])
    b = spark.createDataFrame(batch, sch) if batch else None
    if b is None:
        return
    merged = upsert_keep_last(e, b, ["k"], [F.col("v").desc()])
    rows = merged.collect()
    keys = [r["k"] for r in rows]
    assert len(keys) == len(set(keys))
    batch_best = {}
    for k, v in batch:
        batch_best[k] = max(v, batch_best.get(k, -1))
    exist_best = {}
    for k, v in existing:
        exist_best[k] = max(v, exist_best.get(k, -1))
    for r in rows:
        if r["k"] in batch_best:
            assert r["v"] == batch_best[r["k"]]
        else:
            assert r["v"] == exist_best[r["k"]]
    replay = upsert_keep_last(merged, b, ["k"], [F.col("v").desc()])
    assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, rows))


def test_asof_join_backward_forward_tolerance(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"),
         (2, "2024-01-01 09:00:00")],
        "k long, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 10.0), (1, "2024-01-01 11:00:00", 20.0),
         (1, "2024-01-01 13:00:00", 30.0)],
        "k long, rts string, v double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    back = asof_join(left, right, ["k"], "lts", "rts", ["v"])
    got = {(r["k"], str(r["lts"])): r["v"] for r in back.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 10.0   # latest <= 10:00
    assert got[(1, "2024-01-01 12:00:00")] == 20.0
    assert got[(2, "2024-01-01 09:00:00")] is None   # no right rows for k=2

    fwd = asof_join(left, right, ["k"], "lts", "rts", ["v"],
                    direction="forward")
    got = {(r["k"], str(r["lts"])): r["v"] for r in fwd.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 20.0   # earliest >= 10:00
    assert got[(1, "2024-01-01 12:00:00")] == 30.0

    tol = asof_join(left, right, ["k"], "lts", "rts", ["v"],
                    tolerance="45 minutes")
    got = {(r["k"], str(r["lts"])): r["v"] for r in tol.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 10.0   # 30 min stale: keeps
    assert got[(1, "2024-01-01 12:00:00")] is None   # 60 min stale: nulled


def test_asof_join_equal_ts_inclusive(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7.0)], "k long, rts string, v double"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    assert out[0]["v"] == 7.0


def test_interval_join_matches_naive(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        interval_join,
    )

    points = (
        spark.range(0, 500)
        .select(
            F.col("id").alias("pid"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=(F.col("id") * 137) % 86400)).alias("pts"),
        )
    )
    ivals = (
        spark.range(0, 60)
        .select(
            F.col("id").alias("iid"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=(F.col("id") * 1411) % 80000)).alias("s"),
        )
        .withColumn("e", F.col("s") + F.expr("INTERVAL 47 MINUTES"))
    )
    fast = interval_join(points, ivals, "pts", "s", "e", bucket="30 minutes")
    naive = points.crossJoin(ivals).filter(
        (F.col("pts") >= F.col("s")) & (F.col("pts") < F.col("e"))
    )
    key = lambda r: (r["pid"], r["iid"])
    assert sorted(map(key, fast.collect())) == sorted(map(key, naive.collect()))
    assert fast.count() > 0


def test_connected_components_known_graph(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.graph import (
        connected_components,
        dedup_groups_from_pairs,
    )

    # Chain 1-2-3-4, clique 10-11-12, pair 20-21; 30 is isolated (no edges).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "id_a long, id_b long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    ids = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30]], "doc_id long")
    groups = dedup_groups_from_pairs(edges, ids, "doc_id").collect()
    by_id = {r["doc_id"]: (r["group_id"], r["is_representative"]) for r in groups}
    assert by_id[30] == (30, True)      # singleton is its own representative
    assert by_id[4] == (1, False)
    assert by_id[1] == (1, True)
    reps = [i for i, (_, is_rep) in by_id.items() if is_rep]
    assert sorted(reps) == [1, 10, 20, 30]


def test_connected_components_long_chain_converges(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.graph import (
        connected_components,
    )

    # 200-node path graph: worst case for label propagation (diameter
    # 200) — star-contraction must still converge in <= 20 rounds.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    out = connected_components(edges).collect()
    assert len(out) == 201
    assert all(r["component"] == 0 for r in out)


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """asof_join against pandas.merge_asof as the reference
    implementation, on random keyed timestamp data (backward,
    inclusive)."""
    import pandas as pd

    n_left = data.draw(st.integers(1, 25))
    n_right = data.draw(st.integers(0, 25))
    lrows = [
        (data.draw(st.integers(0, 3)), data.draw(st.integers(0, 10**6)))
        for _ in range(n_left)
    ]
    rrows = [
        (data.draw(st.integers(0, 3)), data.draw(st.integers(0, 10**6)), float(i))
        for i in range(n_right)
    ]
    # pandas merge_asof requires unique-per-key sort; dedup right (k, ts)
    seen = set()
    rrows = [r for r in rrows if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(k, t) for k, t in lrows], "k long, t long"
    ).withColumn("lts", F.timestamp_seconds("t")).drop("t")
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in rrows] or [(99, 0, 0.0)],
        "k long, t long, v double",
    ).withColumn("rts", F.timestamp_seconds("t")).drop("t")
    if not rrows:
        right = right.filter(F.col("k") < 0)

    got = {
        (r["k"], r["lts"]): r["v"]
        for r in asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()
    }

    if not rrows:
        assert all(v is None for v in got.values())
        return
    lpd = pd.DataFrame([(k, pd.Timestamp(t, unit="s")) for k, t in lrows],
                       columns=["k", "lts"]).sort_values("lts", kind="stable")
    rpd = pd.DataFrame([(k, pd.Timestamp(t, unit="s"), v) for k, t, v in rrows],
                       columns=["k", "rts", "v"]).sort_values("rts", kind="stable")
    exp = pd.merge_asof(lpd, rpd, left_on="lts", right_on="rts", by="k",
                        direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["v"]) else row["v"]
        assert got[(row["k"], row["lts"].to_pydatetime())] == want


def test_asof_join_multiple_right_columns(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], "k long, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0, "low"),
         (1, "2024-01-01 11:00:00", 9.0, "high")],
        "k long, rts string, v double, label string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = asof_join(left, right, ["k"], "lts", "rts", ["v", "label"]).collect()
    # Both carried columns come from the SAME winning row (11:00).
    assert out[0]["v"] == 9.0 and out[0]["label"] == "high"
    assert str(out[0]["matched_ts"]).startswith("2024-01-01 11:00")


def test_salted_join_splits_hot_key_across_partitions(spark):
    """The 100 TB scenario salting exists for: one key holds most fact
    rows.  Assert (a) result parity with the plain join, and (b) the
    hot key's rows actually spread across many (key, salt) shuffle
    partitions instead of one reducer."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        salted_join,
    )

    # 50k rows for the hot key, 50 for each of 100 cold keys
    hot = spark.range(50_000).select(
        F.lit(7).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(5_000).select(
        (F.col("id") % 100 + 100).alias("k"), F.col("id").alias("v")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(300).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )

    out = salted_join(fact, dim, "k", salt_buckets=16)
    plain = fact.join(dim, "k")
    assert out.count() == plain.count()
    assert (
        out.select(F.sum("v"), F.sum("attr")).first()
        == plain.select(F.sum("v"), F.sum("attr")).first()
    )

    # the hot key must occupy >1 salt bucket — measure the actual salt
    # derivation the operator uses
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(16)
    )
    n_buckets = (
        fact.filter(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets == 16

    # determinism under retry/recompute: same plan twice, same rows
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, salted_join(fact, dim, "k", salt_buckets=16).collect()))
    assert a == b


def test_pagerank_star_graph_analytic(spark):
    """Undirected star (center 0, leaves 1..4): symmetric analytic
    fixed point — center rank from leaf contributions d*r_leaf each,
    leaves get d*r_c/4.  Compare the operator against a plain Python
    replay of the same recurrence (exact same float ops modulo
    summation order, tolerance 1e-12), plus the structural invariants:
    Σ rank = 1 and every rank positive."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.graph import (
        pagerank,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    got = {
        r["node"]: (r["deg"], r["rank"])
        for r in pagerank(edges, n_iter=10, damping=0.85).collect()
    }
    # python replay of the same recurrence
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    rank = {v: 1 / 5 for v in deg}
    for _ in range(10):
        contrib = {v: 0.0 for v in deg}
        for u in deg:
            for v in ([1, 2, 3, 4] if u == 0 else [0]):
                contrib[v] += rank[u] / deg[u]
        rank = {v: 0.15 / 5 + 0.85 * contrib[v] for v in deg}
    assert set(got) == set(deg)
    for v in deg:
        assert got[v][0] == deg[v]
        assert abs(got[v][1] - rank[v]) < 1e-12, v
    total = sum(r for _, r in got.values())
    assert abs(total - 1.0) < 1e-9
    assert all(r > 0 for _, r in got.values())
    # leaves are symmetric: identical ranks
    leaf_ranks = {got[v][1] for v in (1, 2, 3, 4)}
    assert len(leaf_ranks) == 1


def test_pagerank_disconnected_components_mass(spark):
    """Two disjoint triangles: within each component every node has the
    same degree, so PageRank is uniform (1/6 each) and per-component
    mass is exactly split."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.graph import (
        pagerank,
    )

    tri = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(tri, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=8).collect()}
    for v, r in got.items():
        assert abs(r - 1 / 6) < 1e-12, (v, r)


@st.composite
def word_docs(draw):
    """Small corpora over a tiny vocabulary — maximizes borderline
    Jaccard pairs, the adversarial case for prefix filtering."""
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    n = draw(st.integers(min_value=0, max_value=8))
    docs = []
    for _ in range(n):
        k = draw(st.integers(min_value=0, max_value=6))
        words = [
            vocab[draw(st.integers(min_value=0, max_value=len(vocab) - 1))]
            for _ in range(k)
        ]
        docs.append(" ".join(words))
    return docs


@settings(max_examples=10, deadline=None)
@given(docs=word_docs(), tq=st.sampled_from([0.34, 0.5, 0.75]))
def test_exact_jaccard_join_total_recall_property(spark, docs, tq):
    """For ANY corpus and threshold, prefix filtering must return
    exactly the all-pairs brute-force result — total recall is the
    operator's defining guarantee (LSH gives probabilistic recall;
    this must give certainty)."""
    from itertools import combinations

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (
        exact_jaccard_join,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in exact_jaccard_join(df, threshold=tq).collect()
    }

    def jac(a, b):
        sa, sb = set(a.split()) - {""}, set(b.split()) - {""}
        if not sa or not sb:
            return None
        return len(sa & sb) / len(sa | sb)

    exp = {}
    for i, j in combinations(range(len(docs)), 2):
        v = jac(docs[i], docs[j])
        if v is not None and round(v, 6) >= tq:
            exp[(i, j)] = round(v, 6)
    assert got == exp


@settings(max_examples=10, deadline=None)
@given(docs=word_docs(), tq=st.sampled_from([0.34, 0.5, 0.75]))
def test_containment_join_total_recall_property(spark, docs, tq):
    """For ANY corpus and threshold, the contained-side prefix filter
    must return exactly the all-ORDERED-pairs brute-force containment
    result.  The tiny-vocabulary corpus is the adversarial case for
    both the prefix filter (everything collides) and the unordered-pair
    canonicalization (both directions of one pair clear their own
    denominators)."""
    from itertools import permutations

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (
        containment_join,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in containment_join(df, threshold=tq).collect()
    }

    exp = {}
    for i, j in permutations(range(len(docs)), 2):
        sa = set(docs[i].split()) - {""}
        sb = set(docs[j].split()) - {""}
        if not sa or not sb:
            continue
        # the contract filters on the UNROUNDED ratio; round(…, 6) is
        # presentation only
        c = len(sa & sb) / len(sa)
        if c >= tq:
            exp[(i, j)] = round(c, 6)
    assert got == exp

    # the PPJoin positional prune must be recall-free on the same
    # corpus (the auto mode picks it on degenerate corpora; force both
    # modes here so neither ever diverges from the definition)
    for forced in (True, False):
        got_f = {
            (r["contained_id"], r["container_id"]): r["containment"]
            for r in containment_join(
                df, threshold=tq, positional_filter=forced
            ).collect()
        }
        assert got_f == exp


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_gram_matrix_property_vs_numpy(spark, data):
    """Gram entries equal a direct numpy computation for any vectors
    and any partitioning (exact integer algebra — no tolerance)."""
    import numpy as np

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        gram_matrix_quantized,
    )

    n = data.draw(st.integers(min_value=1, max_value=6))
    dim = data.draw(st.integers(min_value=1, max_value=4))
    vecs = [
        [
            data.draw(
                st.floats(
                    min_value=-1.0,
                    max_value=1.0,
                    allow_nan=False,
                    width=32,
                )
            )
            for _ in range(dim)
        ]
        for _ in range(n)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    parts = data.draw(st.sampled_from([1, 3]))
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix_quantized(
            df.repartition(parts), "embedding"
        ).collect()
    }
    q = np.floor(np.asarray(vecs, dtype=np.float32).astype(np.float64) * 1000).astype(
        np.int64
    )
    g = q.T @ q
    exp = {
        (i, j): int(g[i, j]) for i in range(dim) for j in range(dim)
    }
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_minhash_pipeline_finds_planted_near_dups(spark, data):
    """Planted high-similarity pairs (one-char edits of a long base)
    must always survive the full LSH pipeline — at j >= ~0.95 a
    16-band/4-row miss has p < 1e-9, so this is deterministic in
    practice — and every reported pair must carry its exact Jaccard
    >= threshold (precision is exact by construction).  Guards the
    banding/bucket plumbing (incl. the singleton-bucket filter)
    against silent recall loss."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (
        minhash_near_duplicates,
    )

    import random as _random

    seed = data.draw(st.integers(min_value=0, max_value=10_000))
    rng = _random.Random(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    base = "".join(rng.choice(alphabet) for _ in range(400))
    texts = [base]
    n_dups = data.draw(st.integers(min_value=1, max_value=3))
    for _ in range(n_dups):
        pos = rng.randrange(len(base))
        texts.append(base[:pos] + rng.choice(alphabet) + base[pos + 1:])
    # decoys: independent random docs (jaccard ~ tiny)
    for _ in range(3):
        texts.append(
            "".join(rng.choice(alphabet) for _ in range(400))
        )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_duplicates(df, threshold=0.5).collect()
    }
    # every planted (0, k) pair found
    for k in range(1, n_dups + 1):
        assert (0, k) in got, f"planted pair (0, {k}) missed"
        assert got[(0, k)] >= 0.5
    # precision: nothing reported below threshold
    assert all(j >= 0.5 for j in got.values())


def test_asof_join_carries_null_fields_from_matched_row(spark):
    """The matched right row's NULL field must surface as NULL — not be
    papered over with a STALER row's value that then passes the
    tolerance gate it should have failed."""
    from datetime import datetime

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        asof_join,
    )

    t = datetime
    right = spark.createDataFrame(
        [("u", t(2024, 1, 1, 0, 0), 5.0), ("u", t(2024, 1, 1, 12, 0), None)],
        "k string, rts timestamp, v double",
    )
    left = spark.createDataFrame(
        [("u", t(2024, 1, 1, 12, 30))], "k string, lts timestamp"
    )
    out = asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()[0]
    assert out["matched_ts"] == t(2024, 1, 1, 12, 0)
    assert out["v"] is None  # from the matched row, not the stale one
    # and with a tolerance tighter than the stale row's age, the stale
    # value must not leak through as a "fresh" match
    out2 = asof_join(
        left, right, ["k"], "lts", "rts", ["v"], tolerance="60 minutes"
    ).collect()[0]
    assert out2["matched_ts"] == t(2024, 1, 1, 12, 0) and out2["v"] is None


def test_join_operator_edge_guards(spark):
    """Review-r8 join hardening: salted_join rejects dim-preserving
    outer flavors (each unmatched dim row would surface once per salt
    replica), asof_join rejects output-name collisions loudly, never
    matches NULL keys to each other (SQL join semantics), and resolves
    equal-(key, ts) right-row ties deterministically; interval_join
    explodes an INVERTED interval to zero rows instead of a full
    descending bucket range."""
    import pytest as _pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
        asof_join,
        interval_join,
        salted_join,
    )

    fact = spark.createDataFrame([(1, "f")], "k long, fv string")
    dim = spark.createDataFrame([(1, "d"), (2, "e")], "k long, dv string")
    with _pytest.raises(ValueError, match="salt replica"):
        salted_join(fact, dim, "k", how="full")
    # semi/anti verdicts match the unsalted join
    semi = salted_join(fact, dim, "k", how="left_semi")
    assert [r["k"] for r in semi.collect()] == [1]

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00"), (None, "2024-01-01 10:30:00")],
        "k long, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    # two right rows TIED on (key, ts) with different payloads, plus a
    # null-keyed right row that must never match anything
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10.0),
            (1, "2024-01-01 10:00:00", 20.0),
            (None, "2024-01-01 09:00:00", 99.0),
        ],
        "k long, rts string, v double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    with _pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumn("v", F.lit(0.0)), right, ["k"],
            "lts", "rts", ["v"],
        )

    winners = set()
    for n_parts in (1, 3, 7):  # physical layout must not pick the winner
        out = {
            r["k"]: r["v"]
            for r in asof_join(
                left, right.repartition(n_parts), ["k"],
                "lts", "rts", ["v"],
            ).collect()
        }
        winners.add(out[1])
        assert out[None] is None  # NULL keys never match
    assert len(winners) == 1  # deterministic tie resolution

    points = spark.createDataFrame(
        [("2024-01-01 10:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    inverted = spark.createDataFrame(
        [("2024-01-01 12:00:00", "1970-01-01 00:00:00")],
        "s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )
    out = interval_join(points, inverted, "ts", "s", "e", bucket="1 hour")
    assert out.count() == 0  # zero rows, zero exploded bucket blowup


def test_pagerank_broadcast_and_shuffle_loops_agree(spark):
    """Round-13 rework: while count(nodes) <= spark.graft.pagerank.
    broadcastNodes the loop broadcasts the node-sized rank table;
    past it the old shuffle-join loop runs.  The two paths must be
    row-identical on the same graph (same float recurrence; only the
    summation layout differs, and on this integer-free 1/2^k-friendly
    fixture even the doubles agree exactly for the ranks' 1e-12
    comparison)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.graph import (
        PAGERANK_BROADCAST_NODES_KEY,
        pagerank,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 23) for i in range(40)] + [(3, 17), (5, 19)],
        "src long, dst long",
    )
    bc = {
        r["node"]: (r["deg"], r["rank"])
        for r in pagerank(edges, n_iter=6).collect()
    }
    spark.conf.set(PAGERANK_BROADCAST_NODES_KEY, "1")  # force fallback
    try:
        sh = {
            r["node"]: (r["deg"], r["rank"])
            for r in pagerank(edges, n_iter=6).collect()
        }
    finally:
        spark.conf.unset(PAGERANK_BROADCAST_NODES_KEY)
    assert set(bc) == set(sh)
    for v in bc:
        assert bc[v][0] == sh[v][0], v
        assert abs(bc[v][1] - sh[v][1]) < 1e-12, v


def test_semi_join_ids_matches_semi_join_both_tiers(spark):
    """idfilter.semi_join_ids (round-13: the verify stages' pushed
    literal-In fast path) must select EXACTLY the plain semi-join's
    rows on both tiers: under the bound (collected isin) and past it
    (plain semi-join fallback), including NULL ids (match neither)
    and duplicate left rows (all kept)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.idfilter import (
        semi_join_ids,
    )

    left = spark.createDataFrame(
        [(1, "a"), (1, "a2"), (2, "b"), (None, "n"), (5, "e")],
        "doc_id long, text string",
    )
    ids = spark.createDataFrame(
        [(1,), (5,), (None,), (9,)], "doc_id long"
    )
    want = sorted(
        map(tuple, left.join(ids, "doc_id", "left_semi").collect())
    )
    got_fast = sorted(
        map(tuple, semi_join_ids(left, ids, "doc_id").collect())
    )
    got_fallback = sorted(
        map(
            tuple,
            semi_join_ids(left, ids, "doc_id", max_pushdown=2).collect(),
        )
    )
    assert got_fast == want
    assert got_fallback == want
    # empty id set selects nothing without scanning
    empty = ids.filter(F.lit(False))
    assert semi_join_ids(left, empty, "doc_id").count() == 0
