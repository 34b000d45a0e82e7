"""Similarity-search tests: brute-force exactness on a hand-checkable
fixture and LSH recall against the brute-force baseline on real
embeddings."""

import math

import pytest
from pyspark.sql import functions as F

from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_hand_computed(spark):
    corpus = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
    )
    out = cosine_topk(corpus, corpus.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["vec_id"] for r in rows] == [1, 2]
    expected = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(rows[0]["cosine"] - round(expected, 6)) < 1e-6
    # self-match excluded
    assert 0 not in [r["vec_id"] for r in rows]


def test_lsh_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    # 4 planes × 16 tables: collision prob per table (1-θ/π)^4 — for
    # within-cluster neighbors (cos ≥ 0.5, θ ≤ π/3) that is ≥ 0.198, so
    # 16 tables give ≥ 1-(1-0.198)^16 ≈ 0.97 expected recall.
    approx = lsh_topk(emb, queries, k=5, tables=16, planes=4)
    exact_pairs = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    approx_pairs = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_srp_generated_sql_buckets_bit_identical(spark):
    """The generated-SQL fast path (_srp_signs one-statement
    materialization + _srp_bucket_from_signs expression strings) must
    produce exactly the buckets of the per-row hash formulation
    (_srp_bucket) — the LSH recall math assumes they are the same
    hash family, and a silent drift would skew every bucket join."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        _srp_bucket,
        _srp_bucket_from_signs,
        _srp_signs,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(100)
    for tables, planes in ((3, 4), (2, 7)):
        dim = len(emb.select("embedding").first()[0])
        signs = _srp_signs(spark, tables, planes, dim)
        assert len(signs) == tables and len(signs[0]) == planes
        assert all(s in (1.0, -1.0) for s in signs[0][0])
        fast = emb.select(
            "vec_id",
            *[
                _srp_bucket_from_signs("`embedding`", signs[t]).alias(f"b{t}")
                for t in range(tables)
            ],
        ).collect()
        slow = emb.select(
            "vec_id",
            *[
                _srp_bucket(F.col("embedding"), t, planes).alias(f"b{t}")
                for t in range(tables)
            ],
        ).collect()
        assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_lsh_reported_cosines_are_exact(spark):
    """The approximate path may miss neighbors but must never report a
    wrong cosine (exact re-rank property)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=50).collect()
    }
    for r in lsh_topk(emb, queries, k=5).collect():
        key = (r["qid"], r["vec_id"])
        if key in exact:
            assert abs(exact[key] - r["cosine"]) < 1e-9


def test_ivf_pruned_recall_vs_bruteforce(spark, sf_dir):
    """IVF with n_probe=3 of 8 lists scans ~3/8 of the corpus but must
    still recover most true neighbors (recall@5 >= 0.6 on this data) —
    and full probe must be exactly the brute-force answer."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)

    exact = {
        (r["qid"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    pruned = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect()
    }
    recall = len(exact & pruned) / len(exact)
    assert recall >= 0.6, f"recall@5 too low: {recall:.2f}"

    full = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8).collect()
    }
    assert full == exact


def test_cosine_pairs_blocked_exact(spark, sf_dir):
    """Blocked self-join finds EXACTLY the brute-force above-threshold
    pairs — every pair once, regardless of which blocks ids land in."""
    import numpy as np

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_blocked(emb, threshold=0.45, n_blocks=5).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r[0] for r in rows]
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    want = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.45
    }
    assert got == want


def test_semantic_dedup_drops_planted_duplicates(spark):
    """Exact duplicate vectors share a cluster (identical centroid
    similarities), so semantic dedup must keep the smallest id of each
    duplicate group and drop the rest; distinct vectors survive."""
    import math

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        semantic_dedup,
    )

    def vec(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = []
    # 8 well-separated base vectors; ids 100+ duplicate ids 0/1/2.
    for i in range(8):
        rows.append((i, vec(i * 0.7)))
    for j, base in enumerate([0, 1, 2]):
        rows.append((100 + j, vec(base * 0.7)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        df, threshold=0.999, n_lists=4
    ).collect()}
    assert len(out) == 11
    assert all(out[i] for i in range(8))          # originals kept
    assert not any(out[100 + j] for j in range(3))  # duplicates dropped
    # determinism
    again = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        df, threshold=0.999, n_lists=4
    ).collect()}
    assert again == out


def test_semantic_dedup_scale_smoke_1m(spark):
    """1M synthetic 32-dim vectors, n_lists=4096 (SemDeDup regime:
    many small clusters), injected deterministic codebook.

    Asserts the scale contract, not timing: (a) run completes with row
    conservation, (b) planted near-duplicates are dropped, (c) the
    candidate pair stage's prefix filter holds the exact-verify join to
    ~|planted dups| instead of Σ|cluster|² (measured by re-deriving the
    slim-join cardinality), (d) the pair join is a shuffle join on
    list_id — no cartesian product in the plan."""
    import numpy as np

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        semantic_dedup,
    )

    n, dim, n_lists = 1_000_000, 32, 4096
    # Deterministic pseudo-random vectors, engine-side (no driver-side
    # generation of 1M rows).  Components must be INDEPENDENT across
    # dimensions: any sin(f(id) + g(j)) construction puts all rows on a
    # 1-D curve in vector space, which skews the clustering (259/4096
    # clusters used, Σ|c|² ≈ 5.7e9 pairs) and plants ~1% accidental
    # near-dups.  xxhash64(id, j) gives true high-dim spread.
    comp = "pmod(xxhash64(id, j), 2000) / 1000.0 - 1.0"
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), j -> cast({comp} as float))"
        ).alias("embedding"),
    )
    # plant dups: ids >= n duplicate ids 0..4999 exactly
    dups = spark.range(5000).select(
        (F.col("id") + n).alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), j -> cast({comp} as float))"
        ).alias("embedding"),
    )
    corpus = base.unionByName(dups)

    rng = np.random.RandomState(7)
    cent = rng.randn(n_lists, dim)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    out = semantic_dedup(
        corpus, threshold=0.999, n_lists=n_lists, centroids=cent
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    agg = out.agg(
        F.count("*").alias("n"),
        F.sum((~F.col("keep")).cast("long")).alias("dropped"),
    ).collect()[0]
    assert agg["n"] == n + 5000            # row conservation
    # every planted dup has a smaller-id twin in the same cluster
    # (identical vector -> identical assignment) -> all 5000 drop; the
    # spread base corpus contributes at most incidental near-dup drops.
    assert agg["dropped"] >= 5000
    assert agg["dropped"] < 5000 + n // 50


def test_query_set_guard_branches(spark):
    """Query sets under the ceiling work; above it, the operators fail
    fast with the documented remediation instead of collecting a
    fact-sized frame onto the driver."""
    import pytest as _pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators import (
        similarity as sim,
    )

    vecs = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 3), j -> cast(sin(id + j) as float))"
        ).alias("embedding"),
    )
    ok = sim.cosine_topk(vecs, vecs.limit(3), k=2)
    assert ok.count() == 6  # 3 queries x k=2

    old = sim.MAX_QUERY_VECTORS
    sim.MAX_QUERY_VECTORS = 10
    try:
        with _pytest.raises(sim.QuerySetTooLarge):
            sim.cosine_topk(vecs, vecs, k=2)
        with _pytest.raises(sim.QuerySetTooLarge):
            sim.ivf_topk(vecs, vecs, k=2, n_lists=2, n_probe=2)
        # lsh_topk force-broadcasts the melted query side, so it must
        # enforce the same bound (it has no _collect_query_vectors)
        with _pytest.raises(sim.QuerySetTooLarge):
            sim.lsh_topk(vecs, vecs, k=2, tables=2, planes=2)
    finally:
        sim.MAX_QUERY_VECTORS = old


def test_gram_matrix_quantized_hand_computed(spark):
    """Exact integer gram entries, invariant to partitioning."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        gram_matrix_quantized,
    )

    rows = [(1, [0.1, 0.2]), (2, [0.3, -0.4]), (3, [0.0, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # q vectors with scale=1000: [100,200], [300,-400], [0,500]
    # floor on float32-widened values: 0.1f*1000 = 100.00000149 -> 100;
    # -0.4f*1000 = -400.00000596 -> -401
    import math
    import struct as _struct

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    q = [[math.floor(f32(a) * 1000), math.floor(f32(b) * 1000)]
         for a, b in [r[1] for r in rows]]
    exp = {}
    for i in range(2):
        for j in range(2):
            exp[(i, j)] = sum(v[i] * v[j] for v in q)
    for parts in (1, 3):
        out = {
            (r["i"], r["j"]): r["gram"]
            for r in gram_matrix_quantized(
                df.repartition(parts), "embedding"
            ).collect()
        }
        assert out == exp


def test_cosine_topk_zero_norm_query_and_empty_queries(spark):
    """A zero-vector query must not return NaN-ranked arbitrary
    neighbors, and an empty query frame returns an empty typed result
    instead of a numpy axis error."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (
        cosine_topk,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, embedding array<float>",
    )
    zq = spark.createDataFrame(
        [(100, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = cosine_topk(corpus, zq, k=3).collect()
    assert all(r["cosine"] == 0.0 for r in rows)  # defined, not NaN
    empty = corpus.filter("vec_id < 0")
    out = cosine_topk(corpus, empty, k=3)
    assert out.count() == 0
    assert out.columns == ["qid", "vec_id", "cosine", "rank"]


def test_probe_bloom_null_keys_get_boolean_verdict(spark):
    """NULL keys must receive a True/False verdict consistent with the
    build side (which hashes NULL into the bitmap), never NULL."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.bloom import (
        build_bloom,
        probe_bloom,
    )

    seen = spark.createDataFrame(
        [(None,), ("a",)], "k string"
    )
    words = build_bloom(seen, "k", m_bits=1024, k_hashes=3)
    probe = spark.createDataFrame(
        [(None,), ("a",), ("zzz",)], "k string"
    )
    out = {r["k"]: r["possibly_seen"] for r in
           probe_bloom(probe, words, "k", 1024, 3).collect()}
    assert out[None] is True   # built with a NULL key -> possibly seen
    assert out["a"] is True
    assert out["zzz"] in (False, True)  # FP allowed, NULL never
    assert all(v is not None for v in out.values())


def test_ivf_index_store_roundtrip_append_and_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF index (codebook + list_id-partitioned
    assignments): the from-index query path must be row-identical to
    the inline path (the codebook is deterministic), the probed-list
    filter must prune parquet PARTITIONS on the stored layout, and
    appends must be idempotent and use the index's own codebook."""
    import re

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 20)
    queries = emb.filter(F.col("vec_id") < 20)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=8)
    idx = read_ivf_index(spark, path)
    dim = len(corpus.select("embedding").first()[0])
    assert idx["meta"] == {
        "id_col": "vec_id", "vec_col": "embedding",
        "n_lists": 8, "dim": dim, "version": 1,
    }
    assert idx["centroids"].shape == (8, dim)

    inline = sorted(map(tuple, ivf_topk(
        corpus, queries, k=5, n_lists=8, n_probe=3
    ).collect()))
    stored_df = ivf_topk(
        None, queries, k=5, n_probe=3,
        centroids=idx["centroids"], assigned=idx["assignments"],
    )
    stored = sorted(map(tuple, stored_df.collect()))
    assert stored == inline and len(stored) > 0

    # probed-list filter reaches the scan as a PARTITION filter on the
    # stored layout (collect first: final adaptive plan)
    one_q = ivf_topk(
        None, queries.limit(1), k=5, n_probe=1,
        centroids=idx["centroids"], assigned=idx["assignments"],
    )
    one_q.collect()
    plan = one_q._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*list_id", plan), plan

    # semantic_dedup reuses the index too: identical verdicts to the
    # inline path under the same codebook
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        semantic_dedup,
    )

    sd_inline = sorted(map(tuple, semantic_dedup(
        corpus, threshold=0.99, centroids=idx["centroids"]
    ).collect()))
    sd_stored = sorted(map(tuple, semantic_dedup(
        None, threshold=0.99, assigned=idx["assignments"]
    ).collect()))
    assert sd_stored == sd_inline and len(sd_stored) > 0

    # append: assigned with the index's own codebook, idempotent by id
    base_rows = idx["assignments"].count()
    qvec = queries.filter(F.col("vec_id") == 0).first()["embedding"]
    batch = spark.createDataFrame(
        [(900001, qvec), (900002, [float(-x) for x in qvec])],
        "vec_id long, embedding array<float>",
    )
    assert append_to_ivf_index(batch, path) == 2
    assert append_to_ivf_index(batch, path) == 0  # replayed delivery
    idx2 = read_ivf_index(spark, path)
    assert idx2["assignments"].count() == base_rows + 2
    # the appended exact copy of query 0's vector is now its rank-1
    # neighbor through the stored path
    top = ivf_topk(
        None, queries.filter(F.col("vec_id") == 0), k=1, n_probe=8,
        centroids=idx2["centroids"], assigned=idx2["assignments"],
    ).collect()
    assert len(top) == 1 and top[0]["vec_id"] == 900001
    assert abs(top[0]["cosine"] - 1.0) < 1e-6

    # guards: assigned without centroids, and a mismatched key contract
    import pytest as _pytest

    with _pytest.raises(ValueError, match="assigned requires centroids"):
        ivf_topk(None, queries, k=5, assigned=idx2["assignments"])
    with _pytest.raises(ValueError, match="keyed on"):
        append_to_ivf_index(
            batch.withColumnRenamed("vec_id", "id"), path, id_col="id"
        )


def test_ingest_semantic_batch_against_index(spark, sf_dir, tmp_path):
    """Incremental semantic dedup against the persisted IVF index —
    the embedding analog of the text daily-ingest step: exact copies of
    corpus vectors drop with evidence, within-batch duplicates keep the
    smaller id, novel vectors are admitted, and after the append a
    replayed delivery converges (clean and dropped both empty)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        ingest_semantic_batch,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 20)
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=8)

    cvec = corpus.filter(F.col("vec_id") == 100).first()["embedding"]
    novel = [float(x) for x in [1.0] + [0.0] * (len(cvec) - 1)]
    nvec = [float(-x) for x in cvec]  # cosine -1 to its source
    batch = spark.createDataFrame(
        [
            (900001, cvec),   # exact copy of corpus 100 -> dropped
            (900002, nvec),   # novel (anti-parallel to 100) -> kept
            (900003, nvec),   # within-batch dup of 900002 -> dropped
            (900004, novel),  # novel one-hot -> kept
        ],
        "vec_id long, embedding array<float>",
    )
    clean, dropped = ingest_semantic_batch(
        batch, path, threshold=0.99
    )
    assert {r["vec_id"] for r in clean.select("vec_id").collect()} == {
        900002, 900004,
    }
    ev = {
        r["vec_id"]: (r["neighbor_id"], r["cosine"])
        for r in dropped.collect()
    }
    assert ev[900001] == (100, 1.0)
    assert ev[900003] == (900002, 1.0)
    assert set(ev) == {900001, 900003}

    # fold survivors in, then replay the whole delivery: ids pre-filter
    # or re-drop against the now-indexed survivors — nothing admitted
    assert append_to_ivf_index(clean, path) == 2
    clean2, dropped2 = ingest_semantic_batch(batch, path, threshold=0.99)
    assert clean2.count() == 0
    # 900001/900003 re-drop identically (their canonicals are corpus now)
    assert {r["vec_id"] for r in dropped2.collect()} == {900001, 900003}

    # a batch of ONLY already-indexed ids pre-filters to empty: zero
    # touched lists, zero corpus read, empty outputs
    only_admitted = spark.createDataFrame(
        [(900002, nvec), (900004, novel)],
        "vec_id long, embedding array<float>",
    )
    clean3, dropped3 = ingest_semantic_batch(
        only_admitted, path, threshold=0.99
    )
    assert clean3.count() == 0 and dropped3.count() == 0


def _clustered_vecs(spark, specs, dim=8, noise=0.05, seed=7):
    """Rows of unit-ish vectors: specs = [(start_id, n, axis), ...] —
    n vectors near basis vector `axis` with small gaussian noise."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for start, n, axis in specs:
        for i in range(n):
            v = rng.normal(0.0, noise, dim)
            v[axis] += 1.0
            rows.append((start + i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_ivf_retrain_recovers_recall_after_drift(spark, tmp_path):
    """The codebook-staleness heal (round-7 review item 1): appends
    assign against the ORIGINAL codebook forever, so a drifted corpus
    region scatters across lists and probed recall decays; retraining
    on the accumulated vectors re-clusters it.  Plant the drift, show
    the recall drop at n_probe=1, retrain, show recovery — with the
    meta version bumped, replay-safety preserved, and the pinned-reader
    guard firing."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        assert_index_version,
        cosine_topk,
        ivf_topk,
        read_ivf_index,
        retrain_ivf_index,
        write_ivf_index,
    )

    # original corpus: four tight clusters on axes 0-3 -> the four
    # original centroids are ~e0..e3
    original = _clustered_vecs(
        spark, [(0, 25, 0), (100, 25, 1), (200, 25, 2), (300, 25, 3)]
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(original, path, n_lists=4)
    pinned_meta = dict(read_ivf_index(spark, path)["meta"])
    assert pinned_meta["version"] == 1

    # drift: three NEW clusters on axes 4/5/6, near-orthogonal to EVERY
    # original centroid — each drifted vector's argmax over ~e0..e3 is
    # its own dim-0..3 noise, so each drifted cluster SCATTERS roughly
    # uniformly across the four lists
    drifted = _clustered_vecs(
        spark, [(1000, 100, 4), (2000, 100, 5), (3000, 100, 6)], seed=11
    )
    assert append_to_ivf_index(drifted, path) == 300

    # queries from the drifted clusters (fresh ids, not in the corpus)
    queries = _clustered_vecs(
        spark, [(9000, 5, 4), (9100, 5, 5), (9200, 5, 6)], seed=23
    )
    corpus_all = original.unionByName(drifted)
    truth = {
        (r["qid"], r["vec_id"])
        for r in cosine_topk(corpus_all, queries, k=10).collect()
    }

    def recall(idx):
        got = {
            (r["qid"], r["vec_id"])
            for r in ivf_topk(
                None, queries, k=10, n_probe=1,
                centroids=idx["centroids"],
                assigned=idx["assignments"],
            ).collect()
        }
        return len(got & truth) / len(truth)

    r_before = recall(read_ivf_index(spark, path))
    out = retrain_ivf_index(spark, path)
    assert out == {"n_vectors": 400, "n_lists": 4, "version": 2}
    idx2 = read_ivf_index(spark, path)
    assert idx2["meta"]["version"] == 2
    r_after = recall(idx2)
    assert r_before < 0.7, (r_before, r_after)
    assert r_after > 0.9, (r_before, r_after)
    assert r_after > r_before

    # replay safety across the retrain: ids survived the re-assignment,
    # so a redelivered append still no-ops
    assert append_to_ivf_index(drifted, path) == 0
    assert idx2["assignments"].count() == 400

    # pinned-reader guard: the generation-1 reader fails loudly
    with _pytest.raises(ValueError, match="generation 2"):
        assert_index_version(spark, path, pinned_meta)
    assert_index_version(spark, path, idx2["meta"])  # fresh pin passes


def test_ivf_retrain_crash_windows_recover(spark, tmp_path):
    """The whole-index swap's crash states form a closed class (the
    compaction pattern): stale staging is cleared, a crash between the
    two renames leaves the index LOUDLY unreadable and the next retrain
    restores it, a crash after swap-in drops the backup.  Every window
    converges to a readable, version-bumped index."""
    import os
    import shutil

    import pytest as _pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        read_ivf_index,
        retrain_ivf_index,
        write_ivf_index,
    )

    corpus = _clustered_vecs(spark, [(0, 40, 0), (100, 40, 3)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)

    # window 1: stale staging debris from a crashed rebuild
    os.makedirs(f"{path}__retrain/junk", exist_ok=True)
    out1 = retrain_ivf_index(spark, path)
    assert out1["version"] == 2
    assert not os.path.exists(f"{path}__retrain")

    # window 2: crash BETWEEN the renames (live dir gone) — readers
    # fail loudly, the next retrain restores the backup first
    shutil.move(path, f"{path}__old")
    with _pytest.raises(ValueError, match="meta table is missing"):
        read_ivf_index(spark, path)
    out2 = retrain_ivf_index(spark, path)
    assert out2["version"] == 3
    assert not os.path.exists(f"{path}__old")
    assert read_ivf_index(spark, path)["meta"]["version"] == 3

    # window 3: crash AFTER swap-in, before the backup delete — both
    # dirs exist; the live one wins and the backup is dropped
    shutil.copytree(path, f"{path}__old")
    out3 = retrain_ivf_index(spark, path)
    assert out3["version"] == 4
    assert not os.path.exists(f"{path}__old")
    assert read_ivf_index(spark, path)["assignments"].count() == 80

    # window 2 through the PROBE path: the drift probe reads meta, so
    # retrain_if_drifted must run the swap recovery FIRST or a stream
    # killed mid-swap could never self-heal (review r8)
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        ivf_occupancy_skew,
        retrain_if_drifted,
    )

    shutil.move(path, f"{path}__old")
    with _pytest.raises(ValueError, match="meta table is missing"):
        ivf_occupancy_skew(spark, path)
    # healthy occupancy after recovery -> probe passes, no retrain
    assert retrain_if_drifted(spark, path, skew_threshold=1e9) is None
    assert read_ivf_index(spark, path)["meta"]["version"] == 4
    assert not os.path.exists(f"{path}__old")


def test_ivf_rebuild_bumps_version_for_pinned_readers(spark, tmp_path):
    """A full REBUILD at an existing path changes the codebook exactly
    like a retrain does, so it must bump the meta generation too —
    otherwise a pinned reader's assert_index_version compares 1 == 1
    and silently mixes the OLD codebook with the NEW assignments
    (review r8)."""
    import pytest as _pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        assert_index_version,
        read_ivf_index,
        write_ivf_index,
    )

    corpus = _clustered_vecs(spark, [(0, 30, 0), (100, 30, 2)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    pinned = dict(read_ivf_index(spark, path)["meta"])
    assert pinned["version"] == 1

    # the recovery the missing-meta error message prescribes:
    # re-running write_ivf_index at the same path
    write_ivf_index(corpus, path, n_lists=4)
    assert read_ivf_index(spark, path)["meta"]["version"] == 2
    with _pytest.raises(ValueError, match="generation 2"):
        assert_index_version(spark, path, pinned)


def test_ivf_drift_probe_and_conditional_retrain(spark, tmp_path):
    """ivf_occupancy_skew reads ≤ n_lists aggregate rows and flags
    pile-up drift; retrain_if_drifted is a no-op on a healthy index and
    heals a skewed one (occupancy rebalances, version bumps)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        ivf_occupancy_skew,
        retrain_if_drifted,
        read_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        write_ivf_index,
    )

    # healthy: four balanced clusters, one per list
    corpus = _clustered_vecs(
        spark, [(0, 30, 0), (100, 30, 1), (200, 30, 2), (300, 30, 3)]
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    probe0 = ivf_occupancy_skew(spark, path)
    assert probe0["n_vectors"] == 120 and probe0["n_lists"] == 4
    assert probe0["skew"] < 3.0 and probe0["empty_frac"] == 0.0
    assert retrain_if_drifted(spark, path, skew_threshold=3.0) is None
    assert read_ivf_index(spark, path)["meta"]["version"] == 1  # untouched

    # drift: a big appended batch that piles into ONE list (new region
    # with a consistent small lean toward cluster-0's centroid)
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(240):
        v = rng.normal(0.0, 0.02, 8)
        v[6] += 1.0   # new region the codebook never saw
        v[0] += 0.2   # consistent lean -> argmax is cluster 0 for all
        rows.append((5000 + i, [float(x) for x in v]))
    batch = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    assert append_to_ivf_index(batch, path) == 240
    probe1 = ivf_occupancy_skew(spark, path)
    assert probe1["max_list_rows"] >= 240  # the pile-up
    assert probe1["skew"] > 2.5

    out = retrain_if_drifted(spark, path, skew_threshold=2.5)
    assert out is not None and out["version"] == 2
    probe2 = ivf_occupancy_skew(spark, path)
    assert probe2["skew"] < probe1["skew"]
    assert probe2["n_vectors"] == 360


def test_ivf_rebuild_version_survives_meta_crash_window(spark, tmp_path):
    """The rebuild generation bump is durable across its own crash
    window (round-8 ADVICE): write_ivf_index persists the INTENDED
    version to _version_intent before deleting meta, so a rebuild that
    dies between the meta delete and the final meta write resumes the
    intended generation on re-run instead of resetting to 1 — a reset
    would let a reader pinned at generation 1 silently pass
    assert_index_version against the NEW codebook."""
    import os
    import shutil

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        assert_index_version,
        read_ivf_index,
        write_ivf_index,
    )

    corpus = _clustered_vecs(spark, [(0, 30, 0), (100, 30, 2)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    pinned = read_ivf_index(spark, path)["meta"]
    assert pinned["version"] == 1

    # Simulate the crash state a default-version rebuild leaves when it
    # dies right after its meta delete: the intent marker (version 2,
    # written first) is on disk, meta is gone.
    spark.createDataFrame([(2,)], "version int").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "_version_intent"))
    shutil.rmtree(os.path.join(path, "meta"))

    # The documented recovery — re-run the write — must resume v2.
    write_ivf_index(corpus, path, n_lists=4)
    meta = read_ivf_index(spark, path)["meta"]
    assert meta["version"] == 2
    # marker cleared once meta is durable
    assert not os.path.exists(os.path.join(path, "_version_intent"))
    # the gen-1 pinned reader fails loudly, as the bump promises
    with pytest.raises(ValueError, match="generation"):
        assert_index_version(spark, path, pinned)

    # ...and a subsequent HEALTHY rebuild keeps bumping from there
    write_ivf_index(corpus, path, n_lists=4)
    assert read_ivf_index(spark, path)["meta"]["version"] == 3


def test_ivf_unknown_generation_requires_explicit_version(spark, tmp_path):
    """Missing meta + existing assignments + NO intent marker is an
    unknown generation (pre-marker crash or half-copied index): the
    default-version rebuild refuses loudly instead of guessing 1, and
    an explicit version= is honored."""
    import os
    import shutil

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        read_ivf_index,
        write_ivf_index,
    )

    corpus = _clustered_vecs(spark, [(0, 30, 0), (100, 30, 2)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    shutil.rmtree(os.path.join(path, "meta"))

    with pytest.raises(ValueError, match="explicit version="):
        write_ivf_index(corpus, path, n_lists=4)
    write_ivf_index(corpus, path, n_lists=4, version=5)
    assert read_ivf_index(spark, path)["meta"]["version"] == 5


def test_ivf_append_fenced_against_inflight_retrain(spark, tmp_path):
    """Writer fence (round-8 VERDICT item 3): an append that would race
    a retrain's staged rebuild or swap fails LOUDLY — the retrain's
    staging directory doubles as the lease marker — instead of landing
    rows that the swap silently discards.  The fence never deletes the
    debris (that would corrupt a LIVE retrain); the retrain entry
    points own recovery, after which the append succeeds."""
    import os
    import shutil

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        read_ivf_index,
        retrain_ivf_index,
        write_ivf_index,
    )

    corpus = _clustered_vecs(spark, [(0, 30, 0), (100, 30, 2)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    batch = _clustered_vecs(spark, [(500, 5, 1)])

    # retrain staged rebuild in flight -> loud, nothing lands
    os.makedirs(f"{path}__retrain/junk", exist_ok=True)
    with pytest.raises(ValueError, match="retrain in flight"):
        append_to_ivf_index(batch, path)
    assert read_ivf_index(spark, path)["assignments"].count() == 60
    shutil.rmtree(f"{path}__retrain")

    # crashed mid-swap (backup dir present) -> loud, recovery guidance
    shutil.copytree(path, f"{path}__old")
    with pytest.raises(ValueError, match="mid-swap"):
        append_to_ivf_index(batch, path)
    # the retrain entry point recovers the swap; the append then lands
    retrain_ivf_index(spark, path)
    assert append_to_ivf_index(batch, path) == 5
    assert read_ivf_index(spark, path)["assignments"].count() == 65


def test_ivf_append_fenced_against_partition_compaction(spark, tmp_path):
    """Round-9 VERDICT item 3: an append racing compact_ivf_index's
    per-partition `list_id=N` swap is invisible to the root-level
    retrain fence — the appended file would land in a partition
    mid-swap and die with its `__old` directory.  The extended fence
    catches ANY `__compacting`/`__old` sibling under assignments/ and
    fails the append loudly; the compaction entry point owns recovery,
    after which the append succeeds."""
    import glob
    import os
    import shutil

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        compact_ivf_index,
        read_ivf_index,
        write_ivf_index,
    )

    corpus = _clustered_vecs(spark, [(0, 30, 0), (100, 30, 2)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    batch = _clustered_vecs(spark, [(500, 5, 1)])
    victim = sorted(glob.glob(os.path.join(path, "assignments", "list_id=*")))[0]

    # partition rewrite staged -> loud, nothing lands
    os.makedirs(victim + "__compacting")
    with pytest.raises(ValueError, match="partition compaction"):
        append_to_ivf_index(batch, path)
    assert read_ivf_index(spark, path)["assignments"].count() == 60
    shutil.rmtree(victim + "__compacting")

    # crashed mid-swap (partition backup present) -> loud, and the
    # append's lease was released on the way out (compaction takes it)
    shutil.copytree(victim, victim + "__old")
    with pytest.raises(ValueError, match="partition compaction"):
        append_to_ivf_index(batch, path)
    assert not os.path.exists(path + "__lease")
    # the compaction entry point recovers the partition; append lands
    compact_ivf_index(spark, path, min_files=10_000)
    assert append_to_ivf_index(batch, path) == 5
    assert read_ivf_index(spark, path)["assignments"].count() == 65


def test_ivf_lease_excludes_append_during_retrain_window(spark, tmp_path):
    """Round-9 VERDICT item 5, IVF face: while retrain holds the
    writer lease — including the window BEFORE its staging directory
    exists, which the round-9 fence could not see — an append is
    excluded loudly; a hard-crashed retrain's stale lease blocks
    appends until retrain is re-run (it self-breaks its own token,
    recovers, and releases), after which the append lands."""
    import os

    from contextlib import ExitStack

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        read_ivf_index,
        retrain_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    corpus = _clustered_vecs(spark, [(0, 30, 0), (100, 30, 2)])
    path = str(tmp_path / "ivf")
    write_ivf_index(corpus, path, n_lists=4)
    batch = _clustered_vecs(spark, [(500, 5, 1)])

    with ExitStack() as stack:
        stack.enter_context(writer_lease(spark, path, "retrain"))
        with pytest.raises(WriterLeaseHeld, match="retrain"):
            append_to_ivf_index(batch, path)
        assert read_ivf_index(spark, path)["assignments"].count() == 60

    # hard-crashed retrain: stale lease + staging debris together
    with open(path + "__lease", "w") as fh:
        fh.write("retrain")
    os.makedirs(f"{path}__retrain/junk", exist_ok=True)
    with pytest.raises(WriterLeaseHeld, match="retrain"):
        append_to_ivf_index(batch, path)
    # a YOUNG same-token lease is presumed LIVE (the age-gated
    # self-break, round-10 ADVICE) — a re-run retrain racing a slow
    # live one is excluded loudly instead of breaking its lease...
    with pytest.raises(WriterLeaseHeld, match="presumed LIVE"):
        retrain_ivf_index(spark, path)
    # ...and self-breaks only once the lease has aged past the window
    old = os.path.getmtime(path + "__lease") - 3600.0
    os.utime(path + "__lease", (old, old))
    # re-run retrain: self-breaks its own stale lease, clears debris,
    # bumps the generation, releases
    out = retrain_ivf_index(spark, path)
    assert out["version"] == 2
    assert not os.path.exists(path + "__lease")
    assert append_to_ivf_index(batch, path) == 5
    assert read_ivf_index(spark, path)["assignments"].count() == 65
