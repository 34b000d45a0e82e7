"""Round-7 store durability + maintenance contracts:

- the LSH store append's crash-inside-the-append window self-heals on
  re-drive (ADVICE r6 medium #1: buckets-first ordering, idempotence
  keyed on the last-written signatures table, duplicates benign);
- overwrite rebuilds that crash mid-way leave an UNREADABLE store /
  index instead of data readable under a stale parameter pin
  (ADVICE r6 low);
- small-file compaction for the LSH store and the IVF index preserves
  rows, meta pinning, and replay-safety (VERDICT r6 item 2);
- the store-backed dedup verify pushes a literal id filter into the
  corpus scan so an id-clustered lake prunes row groups
  (VERDICT r6 item 1);
- the semantic ingest applies the text path's within-batch id hygiene
  (ADVICE r6 medium #2) and fails loudly on embedding-dim mismatch;
- the composed semantic ingest loop converges under re-drive from any
  crash point, including a PARTIAL index append (the text crash
  matrix's analog, plus the window unique to a single-table append).
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

X = "the quick brown fox jumps over the lazy dog again and again"
Y = "pack my box with five dozen liquor jugs every single day"
Z = "sphinx of black quartz judge my vow under the midnight sky"
U = "completely unrelated content about distributed query engines"
W = "a fresh document on columnar storage formats and encodings"


def _backdate(lease_path, by_s=3600.0):
    """Age a lease file past the presumed-crashed window (the lease's
    self-break is mtime-gated — round-10 ADVICE)."""
    old = os.path.getmtime(lease_path) - by_s
    os.utime(lease_path, (old, old))


def _store_ids(spark, store, table="signatures"):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        read_lsh_signature_store,
    )

    return {
        r["doc_id"]
        for r in read_lsh_signature_store(spark, store)[table]
        .select("doc_id").distinct().collect()
    }


def test_append_crash_inside_store_append_self_heals(spark, tmp_path):
    """Crash BETWEEN the append's buckets and signatures writes (the
    window ADVICE r6 found uncovered): the re-driven ingest step must
    re-derive the same clean set, the re-driven append must re-append
    both tables (no doc left invisible to bucket probes), and the
    duplicate bucket rows it leaves must not change any answer —
    before or after compaction removes them."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        compact_lsh_signature_store,
        ingest_dedup_batch,
        lsh_banded,
        minhash_near_duplicates_against,
        minhash_signatures,
        read_lsh_signature_store,
        shingle_sets,
        write_lsh_signature_store,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (
        append_log_idempotent,
    )

    lake = str(tmp_path / "lake")
    store = str(tmp_path / "store")
    corpus0 = spark.createDataFrame(
        [(101, X), (102, Y)], "doc_id long, text string"
    )
    assert append_log_idempotent(spark, corpus0, lake, "b0")
    write_lsh_signature_store(corpus0, store, num_hashes=16, bands=4)

    def lake_docs():
        return spark.read.parquet(lake).select("doc_id", "text")

    # batch: 1 duplicates corpus X; 2/3 duplicate each other; 4 novel
    batch = spark.createDataFrame(
        [(1, X), (2, Z), (3, Z), (4, U)], "doc_id long, text string"
    )
    clean, pairs = ingest_dedup_batch(lake_docs(), batch, store)
    assert {r["doc_id"] for r in clean.collect()} == {2, 4}
    assert append_log_idempotent(spark, clean, lake, "b1")

    # simulate the crash: ONLY the buckets half of the append lands
    # (exactly what write_lsh_signature_store(mode="append") writes
    # first), signatures never committed
    sigs = minhash_signatures(
        shingle_sets(clean, "text", "doc_id", 5), "doc_id", 16
    )
    lsh_banded(sigs, "doc_id", 4).write.mode("append").parquet(
        os.path.join(store, "buckets")
    )
    assert _store_ids(spark, store) == {101, 102}  # sigs: pre-crash
    assert _store_ids(spark, store, "buckets") == {101, 102, 2, 4}

    # re-drive the whole step: same clean set, same evidence — the
    # orphan bucket rows must NOT self-match docs 2/4 or flip the
    # batch-batch drop orientation
    clean_r, pairs_r = ingest_dedup_batch(lake_docs(), batch, store)
    assert {r["doc_id"] for r in clean_r.collect()} == {2, 4}
    assert {(r["id_a"], r["id_b"]) for r in pairs_r.collect()} == {
        (1, 101), (2, 3),
    }
    assert not append_log_idempotent(spark, clean_r, lake, "b1")
    # the re-driven append re-appends BOTH tables (self-heal direction)
    assert append_batch_signatures(clean_r, store) == 2
    assert _store_ids(spark, store) == {101, 102, 2, 4}

    # duplicate bucket rows exist and are benign: a next batch still
    # sees exactly its true near-dups
    st = read_lsh_signature_store(spark, store)
    assert st["buckets"].count() > st["buckets"].distinct().count()
    nxt = spark.createDataFrame([(201, Z)], "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates_against(
            lake_docs(), nxt, threshold=0.7, num_hashes=16, bands=4,
            corpus_signatures=st["signatures"],
            corpus_buckets=st["buckets"],
        ).collect()
    }
    assert got == {(201, 2)}

    # compaction drops the duplicates, keeps rows/meta, answers hold
    res = compact_lsh_signature_store(spark, store, target_files=1)
    assert res["signatures"] >= 1 and res["buckets"] >= 1
    st2 = read_lsh_signature_store(spark, store)
    assert st2["meta"] == st["meta"]
    assert st2["buckets"].count() == st2["buckets"].distinct().count()
    assert st2["signatures"].count() == 4
    got2 = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_duplicates_against(
            lake_docs(), nxt, threshold=0.7, num_hashes=16, bands=4,
            corpus_signatures=st2["signatures"],
            corpus_buckets=st2["buckets"],
        ).collect()
    }
    assert got2 == {(201, 2)}
    # replayed append after compaction still no-ops
    assert append_batch_signatures(clean_r, store) == 0


def test_lsh_store_compaction_trigger_and_file_counts(spark, tmp_path):
    """min_files makes compaction a cheap no-op below the threshold and
    a real rewrite above it; signature rows are preserved exactly."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        compact_lsh_signature_store,
        read_lsh_signature_store,
        write_lsh_signature_store,
    )

    store = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(1, X), (2, Y)], "doc_id long, text string"
    )
    write_lsh_signature_store(base, store, num_hashes=16, bands=4)
    for i, t in enumerate([Z, U, W]):
        b = spark.createDataFrame(
            [(10 + i, t)], "doc_id long, text string"
        )
        assert append_batch_signatures(b, store) == 1
    before = read_lsh_signature_store(spark, store)
    sig_rows = sorted(
        r["doc_id"] for r in before["signatures"].collect()
    )
    n_files = len(glob.glob(f"{store}/signatures/*.parquet"))
    assert n_files >= 4  # one file set per append

    # below-threshold: untouched
    res = compact_lsh_signature_store(
        spark, store, target_files=1, min_files=n_files + 1
    )
    assert res == {"signatures": 0, "buckets": 0}
    assert len(glob.glob(f"{store}/signatures/*.parquet")) == n_files

    res = compact_lsh_signature_store(
        spark, store, target_files=1, min_files=2
    )
    assert res["signatures"] == n_files
    assert len(glob.glob(f"{store}/signatures/*.parquet")) == 1
    after = read_lsh_signature_store(spark, store)
    assert sorted(
        r["doc_id"] for r in after["signatures"].collect()
    ) == sig_rows
    assert after["meta"] == before["meta"]


def test_compact_lsh_store_recovers_mid_swap_crash(spark, tmp_path):
    """A maintenance run that died between swap-out and swap-in leaves
    `signatures__old` and NO `signatures` — the store is unreadable
    and the table lists zero files, so a min_files trigger alone would
    skip it forever.  The compactor must always revisit crash debris,
    restore the table, and leave the store readable with rows intact."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        compact_lsh_signature_store,
        read_lsh_signature_store,
        write_lsh_signature_store,
    )

    store = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(1, X), (2, Y), (3, Z)], "doc_id long, text string"
    )
    write_lsh_signature_store(docs, store, num_hashes=16, bands=4)
    os.rename(f"{store}/signatures", f"{store}/signatures__old")
    with pytest.raises(Exception):
        read_lsh_signature_store(spark, store)["signatures"].count()
    compact_lsh_signature_store(
        spark, store, target_files=1, min_files=99
    )
    assert not os.path.isdir(f"{store}/signatures__old")
    st = read_lsh_signature_store(spark, store)
    assert sorted(
        r["doc_id"] for r in st["signatures"].collect()
    ) == [1, 2, 3]
    assert st["meta"]["num_hashes"] == 16


def test_stream_ingest_self_maintains_store(spark, tmp_path):
    """compact_store_every makes the streaming loop its own maintenance
    job: after draining several single-file batches, the signatures
    table is compacted instead of holding one file set per batch, and
    the admitted corpus is exactly the unique documents."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        read_lsh_signature_store,
        write_lsh_signature_store,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.dedup_ingest import (  # noqa: E501
        stream_docs_dedup_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    lake = str(tmp_path / "lake")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_lsh_signature_store(empty, store, num_hashes=16, bands=4)

    import pandas as pd

    texts = [X, Y, Z, U, W, X]  # last file duplicates the first
    for i, t in enumerate(texts):
        pd.DataFrame({"doc_id": [i], "text": [t]}).to_parquet(
            raw / f"f{i}.parquet", index=False
        )
    q = stream_docs_dedup_ingest(
        spark, str(raw), lake, store, ckpt,
        max_files_per_trigger=1,
        compact_store_every=3, compact_store_target=1,
    )
    q.awaitTermination(300)
    admitted = {
        r["doc_id"]
        for r in spark.read.parquet(lake).select("doc_id").collect()
    }
    assert admitted == {0, 1, 2, 3, 4}  # doc 5 dropped as dup of 0
    st = read_lsh_signature_store(spark, store)
    assert sorted(
        r["doc_id"] for r in st["signatures"].collect()
    ) == [0, 1, 2, 3, 4]
    sig_files = glob.glob(f"{store}/signatures/*.parquet")
    # five admitted batches landed five file sets; the in-loop trigger
    # kept the table compacted below that
    assert len(sig_files) < 5


def test_stream_semantic_ingest_self_maintains_index(spark, tmp_path):
    """compact_index_every: the vector face's in-loop maintenance —
    after draining several single-vector batches into the same index
    list, the touched partition is compacted instead of holding one
    file per appended batch; admitted vectors and dedup state are
    unchanged."""
    import shutil as _sh

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        read_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.semantic_ingest import (  # noqa: E501
        stream_vectors_semantic_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    lake = str(tmp_path / "lake")
    index = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    corpus = spark.createDataFrame(
        [(i, [10.0 * (1 if i % 2 == 0 else -1), float(i % 3), 1.0, 0.5])
         for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    write_ivf_index(corpus, index, n_lists=2)

    def write_batch(rows, name):
        staging = str(tmp_path / f"_stage_{name}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        _sh.copy(glob.glob(f"{staging}/part-*.parquet")[0],
                 raw / f"{name}.parquet")

    # five novel vectors in the SAME far-off direction region land in
    # one cluster but below threshold of each other; the sixth exactly
    # redelivers the first and must drop
    base = [0.0, 0.0, -40.0, 40.0]
    vecs = [
        (100 + i, [base[0] + 30.0 * i, base[1] - 25.0 * i,
                   base[2], base[3]])
        for i in range(5)
    ]
    for i, row in enumerate(vecs):
        write_batch([row], f"b{i}")
    write_batch([vecs[0]], "b5")

    q = stream_vectors_semantic_ingest(
        spark, str(raw), lake, index, ckpt,
        threshold=0.999, max_files_per_trigger=1,
        compact_index_every=3, compact_index_target=1,
    )
    q.awaitTermination(300)

    lake_ids = {
        r["vec_id"]
        for r in spark.read.parquet(lake).select("vec_id").collect()
    }
    assert lake_ids == {100, 101, 102, 103, 104}
    idx = read_ivf_index(spark, index)
    appended = {
        r["vec_id"]
        for r in idx["assignments"].select("vec_id").collect()
        if r["vec_id"] >= 100
    }
    assert appended == lake_ids
    # every assignments partition stays below one-file-per-batch
    for d in glob.glob(f"{index}/assignments/list_id=*"):
        assert len(glob.glob(f"{d}/*.parquet")) < 5


def test_stream_semantic_ingest_retrains_on_skew(spark, tmp_path):
    """retrain_on_skew: the vector face's in-loop codebook heal — a
    drained batch that piles into one list pushes occupancy skew past
    the threshold, so the NEXT micro-batch's probe triggers a retrain
    (staged rebuild + swap, meta version bump) before it assigns;
    admitted vectors stay exactly-once across the swap."""
    import shutil as _sh

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        ivf_occupancy_skew,
        read_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.semantic_ingest import (  # noqa: E501
        stream_vectors_semantic_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    lake = str(tmp_path / "lake")
    index = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    corpus = spark.createDataFrame(
        [(i, [10.0 * (1 if i % 2 == 0 else -1), float(i % 3), 1.0, 0.5])
         for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    write_ivf_index(corpus, index, n_lists=2)
    assert read_ivf_index(spark, index)["meta"]["version"] == 1

    def write_batch(rows, name):
        staging = str(tmp_path / f"_stage_{name}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        _sh.copy(glob.glob(f"{staging}/part-*.parquet")[0],
                 raw / f"{name}.parquet")

    # batch 0: 30 mutually-distinct vectors (a fan in dims 1-2, max
    # pairwise cosine ~0.996 < threshold) that ALL lean positive on
    # dim 0 -> every one assigns to the even-cluster list (pile-up)
    import math

    write_batch(
        [
            (
                100 + i,
                [
                    50.0,
                    100.0 * math.cos(0.1 * i),
                    100.0 * math.sin(0.1 * i),
                    7.0,
                ],
            )
            for i in range(30)
        ],
        "b0",
    )
    # batch 1: one more novel vector — its PRE-batch probe sees the
    # skew and retrains before assigning
    write_batch([(900, [0.0, 0.0, -40.0, 40.0])], "b1")

    q = stream_vectors_semantic_ingest(
        spark, str(raw), lake, index, ckpt,
        threshold=0.999, max_files_per_trigger=1,
        retrain_on_skew=1.5,
    )
    q.awaitTermination(300)

    idx = read_ivf_index(spark, index)
    assert idx["meta"]["version"] >= 2  # the in-loop retrain ran
    # exactly-once across the swap: every admitted id once, in both
    # the lake and the (re-assigned) index
    lake_ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(lake).select("vec_id").collect()
    )
    assert lake_ids == [100 + i for i in range(30)] + [900]
    assert idx["assignments"].count() == 20 + 31
    assert (
        idx["assignments"].select("vec_id").distinct().count() == 51
    )
    # and the heal actually rebalanced: post-retrain skew is modest
    assert ivf_occupancy_skew(spark, index)["skew"] < 1.5


def test_overwrite_crash_leaves_store_unreadable(
    spark, tmp_path, monkeypatch
):
    """A rebuild with NEW parameters that dies between the data writes
    must not leave the new tables readable under the OLD meta (ADVICE
    r6 low): meta is deleted first and rewritten last, so the
    half-rebuilt store fails loudly at read."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators import (
        text_dedup,
    )

    store = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(1, X), (2, Y)], "doc_id long, text string"
    )
    text_dedup.write_lsh_signature_store(docs, store)
    assert text_dedup.read_lsh_signature_store(spark, store)["meta"][
        "num_hashes"
    ] == 64

    real_banded = text_dedup.lsh_banded

    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-rebuild")

    monkeypatch.setattr(text_dedup, "lsh_banded", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        text_dedup.write_lsh_signature_store(
            docs, store, num_hashes=32, bands=8
        )
    monkeypatch.setattr(text_dedup, "lsh_banded", real_banded)
    # the store is now loudly unreadable — not silently mixed-params
    with pytest.raises(Exception):
        text_dedup.read_lsh_signature_store(spark, store)
    # recovery = re-run the overwrite
    text_dedup.write_lsh_signature_store(docs, store, num_hashes=32, bands=8)
    assert text_dedup.read_lsh_signature_store(spark, store)["meta"][
        "num_hashes"
    ] == 32


def _mk_vec_rows(ids, base):
    # two far-apart clusters around +/-base so a 2-list codebook splits
    rows = []
    for i in ids:
        sign = 1.0 if i % 2 == 0 else -1.0
        rows.append((i, [sign * base, sign * (base + i % 3), 1.0, 0.5]))
    return rows


def test_write_ivf_index_crash_leaves_index_unreadable(
    spark, tmp_path, monkeypatch
):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators import (
        similarity,
    )

    path = str(tmp_path / "ivf")
    corpus = spark.createDataFrame(
        _mk_vec_rows(range(20), 10.0),
        "vec_id long, embedding array<double>",
    )
    similarity.write_ivf_index(corpus, path, n_lists=2)
    assert similarity.read_ivf_index(spark, path)["meta"]["n_lists"] == 2

    real_assign = similarity.assign_ivf_lists

    def boom(*a, **k):
        raise RuntimeError("simulated crash mid-rebuild")

    # precomputed codebook: the crash must land AFTER the meta delete
    # (train_ivf_centroids itself uses assign_ivf_lists)
    cent = similarity.train_ivf_centroids(corpus, 4)
    monkeypatch.setattr(similarity, "assign_ivf_lists", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        similarity.write_ivf_index(corpus, path, centroids=cent)
    monkeypatch.setattr(similarity, "assign_ivf_lists", real_assign)
    with pytest.raises(Exception):
        similarity.read_ivf_index(spark, path)
    similarity.write_ivf_index(corpus, path, n_lists=4)
    assert similarity.read_ivf_index(spark, path)["meta"]["n_lists"] == 4


def test_compact_ivf_index_parity_replay_and_crash_recovery(
    spark, tmp_path,
):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        compact_ivf_index,
        read_ivf_index,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    corpus = spark.createDataFrame(
        _mk_vec_rows(range(20), 10.0),
        "vec_id long, embedding array<double>",
    )
    write_ivf_index(corpus, path, n_lists=2)
    b1 = spark.createDataFrame(
        _mk_vec_rows(range(100, 104), 10.0),
        "vec_id long, embedding array<double>",
    )
    b2 = spark.createDataFrame(
        _mk_vec_rows(range(200, 204), 10.0),
        "vec_id long, embedding array<double>",
    )
    assert append_to_ivf_index(b1, path) == 4
    assert append_to_ivf_index(b2, path) == 4
    idx = read_ivf_index(spark, path)
    rows_before = sorted(
        (r["vec_id"], r["list_id"])
        for r in idx["assignments"].collect()
    )
    # each touched list holds >= 3 file sets (base + two appends)
    res = compact_ivf_index(spark, path, target_files=1, min_files=2)
    assert res and all(v >= 2 for v in res.values())
    idx2 = read_ivf_index(spark, path)
    assert sorted(
        (r["vec_id"], r["list_id"])
        for r in idx2["assignments"].collect()
    ) == rows_before
    assert idx2["meta"] == idx["meta"]
    for lid in res:
        files = glob.glob(f"{path}/assignments/list_id={lid}/*.parquet")
        assert len(files) == 1
    # replayed append after compaction still no-ops
    assert append_to_ivf_index(b2, path) == 0

    # crash recovery: a maintenance run that died between swap-out and
    # swap-in left list_id=K__old and no list_id=K — the next run must
    # restore it even though the partition is below min_files
    lid = next(iter(res))
    src = f"{path}/assignments/list_id={lid}"
    os.rename(src, src + "__old")
    res2 = compact_ivf_index(spark, path, target_files=1, min_files=99)
    assert lid in res2
    assert os.path.isdir(src) and not os.path.isdir(src + "__old")
    idx3 = read_ivf_index(spark, path)
    assert sorted(
        (r["vec_id"], r["list_id"])
        for r in idx3["assignments"].collect()
    ) == rows_before

    # the rewrite is id-SORTED (round-7): with target_files=2 each
    # partition's files own disjoint vec_id ranges, so the pushed-id
    # exactly-once probes keep pruning row groups after maintenance
    import pyarrow.parquet as pq

    compact_ivf_index(spark, path, target_files=2, min_files=1)
    for lid2 in res:
        spans = []
        for fp in glob.glob(
            f"{path}/assignments/list_id={lid2}/*.parquet"
        ):
            md = pq.ParquetFile(fp).metadata
            col = next(
                md.row_group(0).column(i)
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "vec_id"
            )
            spans.append((col.statistics.min, col.statistics.max))
        spans.sort()
        assert len(spans) >= 2
        for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
            assert hi1 < lo2
    assert sorted(
        (r["vec_id"], r["list_id"])
        for r in read_ivf_index(spark, path)["assignments"].collect()
    ) == rows_before


def test_semantic_ingest_redelivery_hygiene_and_dim_guard(
    spark, tmp_path,
):
    """ADVICE r6 medium #2: an exact redelivered vector row collapses
    silently (admitted ONCE — not dropped-both), the same id with
    different vectors raises, and a dim-mismatched batch fails loudly
    at the entrance rather than inside an executor."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        ingest_semantic_batch,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    corpus = spark.createDataFrame(
        _mk_vec_rows(range(20), 10.0),
        "vec_id long, embedding array<double>",
    )
    write_ivf_index(corpus, path, n_lists=2)

    v = [10.0, 11.5, 1.0, 0.5]
    far = [0.0, 0.0, -40.0, 40.0]  # near no cluster member
    redelivered = spark.createDataFrame(
        [(500, far), (500, far)],
        "vec_id long, embedding array<double>",
    )
    clean, dropped = ingest_semantic_batch(
        redelivered, path, threshold=0.95
    )
    assert [r["vec_id"] for r in clean.collect()] == [500]
    assert dropped.count() == 0

    conflicted = spark.createDataFrame(
        [(501, v), (501, far)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="DIFFERENT vectors"):
        ingest_semantic_batch(conflicted, path, threshold=0.95)

    bad_dim = spark.createDataFrame(
        [(600, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dimension"):
        ingest_semantic_batch(bad_dim, path, threshold=0.95)
    with pytest.raises(ValueError, match="dimension"):
        append_to_ivf_index(bad_dim, path)

    # append_to_ivf_index applies the same entrance hygiene for DIRECT
    # callers: an exact redelivered row collapses to one appended id;
    # the same id with different vectors raises instead of permanently
    # corrupting the keyed index
    dup = spark.createDataFrame(
        [(700, far), (700, far)],
        "vec_id long, embedding array<double>",
    )
    assert append_to_ivf_index(dup, path) == 1
    with pytest.raises(ValueError, match="DIFFERENT vectors"):
        append_to_ivf_index(conflicted, path)

    # a NULL embedding names itself (F.size(NULL) -> None used to
    # TypeError inside sorted() when mixed with a wrong-dim row)
    null_vec = spark.createDataFrame(
        [(601, None), (602, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NULL"):
        ingest_semantic_batch(null_vec, path, threshold=0.95)


def test_signature_store_rowgroups_stay_id_clustered(spark, tmp_path):
    """The signatures table must be physically id-clustered — the
    property the est-stage and id-probe pushed filters prune against:
    narrow row-group doc_id spans after the initial build, and again
    after appends + compaction re-sort the table globally."""
    import pyarrow.parquet as pq

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        compact_lsh_signature_store,
        write_lsh_signature_store,
    )

    def spans(store):
        out = []
        for f in glob.glob(f"{store}/signatures/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema
                    == "doc_id"
                )
                out.append(
                    (col.statistics.min, col.statistics.max)
                )
        return out

    store = str(tmp_path / "store")
    n = 4000
    # ids arrive shuffled; the store write must still cluster them
    docs = spark.range(n).select(
        F.xxhash64("id").alias("_r"),
        F.col("id").alias("doc_id"),
        F.concat(F.lit(W + " tail "), F.col("id")).alias("text"),
    ).orderBy("_r").drop("_r")
    # the store's range shuffle leaves the partition count to AQE
    # (advisory ~64 MB chunks — right at scale); at test scale that
    # coalesces to ONE file, so shrink the advisory size to force
    # several files and make the clustering observable
    confs = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        # the 1 MB floor would re-merge the tiny test shuffle to one
        # partition no matter the advisory size
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        write_lsh_signature_store(docs, store, num_hashes=16, bands=4)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    built = sorted(spans(store))
    assert len(built) >= 2
    # disjoint, narrow ranges — the sorted-lake property
    for (lo1, hi1), (lo2, hi2) in zip(built, built[1:]):
        assert hi1 < lo2
    assert max(hi - lo for lo, hi in built) < n

    # appends land as their own clustered file sets; compaction then
    # re-sorts globally and the property must hold again
    extra = spark.range(n, n + 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(U + " tail "), F.col("id")).alias("text"),
    )
    assert append_batch_signatures(extra, store) == 200
    compact_lsh_signature_store(spark, store, target_files=4)
    after = sorted(spans(store))
    for (lo1, hi1), (lo2, hi2) in zip(after, after[1:]):
        assert hi1 < lo2
    assert after[0][0] == 0 and after[-1][1] == n + 199

    # crash recovery must NOT strip the layout: a maintenance run that
    # died between swap-out and swap-in is revisited (min_files
    # bypassed) and the rewrite re-sorts — a round-robin recovery
    # would silently cost every future pushed-id probe its pruning
    os.rename(f"{store}/signatures", f"{store}/signatures__old")
    compact_lsh_signature_store(
        spark, store, target_files=4, min_files=99
    )
    recovered = sorted(spans(store))
    assert len(recovered) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(recovered, recovered[1:]):
        assert hi1 < lo2
    assert recovered[0][0] == 0 and recovered[-1][1] == n + 199


def test_ingest_crash_matrix_converges_everywhere(spark, tmp_path):
    """Exhaustive crash-point sweep over the composed daily-ingest
    transaction: for EACH crash window (before the doc write, between
    doc write and state append, inside the state append between its
    buckets and signatures halves) injected into EACH batch of a
    3-batch loop, the re-driven loop must end in exactly the no-crash
    loop's lake and store state.  The per-window contracts are pinned
    individually elsewhere; this pins their composition."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        ingest_dedup_batch,
        lsh_banded,
        minhash_signatures,
        read_lsh_signature_store,
        shingle_sets,
        write_lsh_signature_store,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (
        append_log_idempotent,
    )

    v = "one more entirely new passage about broadcast thresholds"
    batches = [
        [(1, X), (2, Z), (3, Z), (4, U)],   # corpus dup + intra dup
        [(11, Z), (12, W)],                  # dup of admitted 2
        [(21, W), (22, v), (23, X)],         # dup of 12, dup of corpus
    ]

    def run_loop(root, crash_batch=None, crash_mode=None):
        lake = f"{root}/lake"
        store = f"{root}/store"
        corpus0 = spark.createDataFrame(
            [(101, X), (102, Y)], "doc_id long, text string"
        )
        append_log_idempotent(spark, corpus0, lake, "b0")
        write_lsh_signature_store(
            corpus0, store, num_hashes=16, bands=4
        )

        def lake_docs():
            return spark.read.parquet(lake).select("doc_id", "text")

        def step(i, rows, crash=None):
            b = spark.createDataFrame(
                rows, "doc_id long, text string"
            )
            if crash == "before_docs":
                ingest_dedup_batch(lake_docs(), b, store)  # work, no writes
                return False  # crashed before anything persisted
            clean, _ = ingest_dedup_batch(lake_docs(), b, store)
            append_log_idempotent(spark, clean, lake, f"b{i + 1}")
            if crash == "after_docs":
                return False  # crashed before the state append
            if crash == "inside_append":
                # exactly the first (buckets) half of the append
                sigs = minhash_signatures(
                    shingle_sets(clean, "text", "doc_id", 5),
                    "doc_id", 16,
                )
                lsh_banded(sigs, "doc_id", 4).write.mode(
                    "append"
                ).parquet(f"{store}/buckets")
                return False
            append_batch_signatures(clean, store)
            return True

        for i, rows in enumerate(batches):
            if i == crash_batch:
                assert step(i, rows, crash_mode) is False
                assert step(i, rows) is True  # the re-drive
            else:
                assert step(i, rows) is True

        lake_state = sorted(
            (r["doc_id"], r["text"])
            for r in lake_docs().collect()
        )
        st = read_lsh_signature_store(spark, store)
        sig_state = sorted(
            r["doc_id"] for r in st["signatures"].collect()
        )
        bucket_state = sorted(map(tuple, st["buckets"].distinct().collect()))
        return lake_state, sig_state, bucket_state

    reference = run_loop(str(tmp_path / "ref"))
    # sanity on the reference itself: dups dropped across batches
    assert [d for d, _ in reference[0]] == [2, 4, 12, 22, 101, 102]

    for crash_batch in range(3):
        for crash_mode in ("before_docs", "after_docs", "inside_append"):
            root = str(tmp_path / f"c{crash_batch}_{crash_mode}")
            got = run_loop(root, crash_batch, crash_mode)
            assert got == reference, (
                f"crash {crash_mode} in batch {crash_batch} diverged"
            )


def test_anti_join_ids_parity_and_pushdown(spark, tmp_path):
    """The guarded pushed-filter anti-join (the id-level exactly-once
    probe) must return exactly the plain anti-join's rows on both
    sides of the guard, and its fast path must reach the store scan
    as a pushed In filter."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.idfilter import (  # noqa: E501
        anti_join_ids,
    )

    store_path = str(tmp_path / "ids")
    spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("v")
    ).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    batch = spark.createDataFrame(
        [(5, "a"), (999, "b"), (5000, "c"), (7000, "d")],
        "doc_id long, text string",
    )
    expected = {5000, 7000}

    fast = anti_join_ids(batch, store, "doc_id")
    assert {r["doc_id"] for r in fast.collect()} == expected
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(doc_id" in plan

    slow = anti_join_ids(batch, store, "doc_id", max_pushdown=2)
    assert {r["doc_id"] for r in slow.collect()} == expected
    plan_slow = slow._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id" not in plan_slow

    # empty batch: falls through to the plain anti-join, stays empty
    empty = batch.filter(F.lit(False))
    assert anti_join_ids(empty, store, "doc_id").count() == 0


def test_semantic_ingest_crash_matrix_converges_everywhere(
    spark, tmp_path,
):
    """The semantic analog of the text crash matrix: for EACH crash
    window (before the vector write, between vector write and index
    append, inside the index append with only PART of the batch's
    assignment rows committed — the partial-job-commit state a
    non-atomic parquet append can expose) injected into EACH batch of
    a 3-batch loop, the re-driven loop must end in exactly the
    no-crash loop's lake and index state.  The partial-append window
    matters because its re-drive takes a DIFFERENT code path: the
    committed id pre-filters away as "already indexed" and acts as a
    corpus dropper (regardless of id) instead of a smaller-id batch
    dropper — convergent only because two admitted vectors are never
    ≥ threshold of each other."""
    import math

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        append_to_ivf_index,
        assign_ivf_lists,
        ingest_semantic_batch,
        read_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (
        append_log_idempotent,
    )

    def ang(deg):  # unit-ish vector in the centroid plane
        r = math.radians(deg)
        return [10 * math.cos(r), 10 * math.sin(r), 0.0, 0.0]

    # centroids train to exactly 0° and 90° (the two corpus vectors);
    # near-dup pairs sit ~2° apart (cos 0.9994 ≥ 0.95), every admitted
    # vector is ≥ 18° from all same-list survivors (cos ≤ 0.91 < 0.95)
    A, B = ang(0), ang(90)
    batches = [
        [(1, ang(2)), (2, ang(35)), (3, ang(33)), (4, ang(125))],
        # 1 drops vs corpus A; 3 drops vs in-batch 2; 2, 4 admitted
        [(11, ang(37)), (12, ang(65))],
        # 11 drops vs ADMITTED 2 (now corpus); 12 admitted
        [(21, ang(63)), (22, [0.0, 7.0, 7.0, 0.0]),
         (23, [10.0, 0.0, 0.4, 0.0])],
        # 21 drops vs admitted 12; 23 drops vs corpus A; 22 admitted
    ]
    schema = "vec_id long, embedding array<double>"

    def run_loop(root, crash_batch=None, crash_mode=None):
        lake = f"{root}/lake"
        index = f"{root}/ivf"
        corpus0 = spark.createDataFrame([(101, A), (102, B)], schema)
        append_log_idempotent(spark, corpus0, lake, "b0")
        write_ivf_index(corpus0, index, n_lists=2)

        def step(i, rows, crash=None):
            b = spark.createDataFrame(rows, schema)
            if crash == "before_docs":
                ingest_semantic_batch(b, index)  # work, no writes
                return False
            clean, _ = ingest_semantic_batch(b, index)
            append_log_idempotent(spark, clean, lake, f"b{i + 1}")
            if crash == "after_docs":
                return False  # crashed before the index append
            if crash == "inside_append":
                # partial job commit: exactly ONE admitted row's
                # assignment lands, the rest of the batch does not
                idx = read_ivf_index(spark, index)
                one = assign_ivf_lists(
                    clean.orderBy("vec_id").limit(1), idx["centroids"]
                )
                one.write.mode("append").partitionBy(
                    "list_id"
                ).parquet(f"{index}/assignments")
                return False
            append_to_ivf_index(clean, index)
            return True

        for i, rows in enumerate(batches):
            if i == crash_batch:
                assert step(i, rows, crash_mode) is False
                assert step(i, rows) is True  # the re-drive
            else:
                assert step(i, rows) is True

        lake_state = sorted(
            (r["vec_id"], tuple(r["embedding"]))
            for r in spark.read.parquet(lake)
            .select("vec_id", "embedding").collect()
        )
        # full multiset, not distinct: a partial append healed by
        # anything short of the id anti-join would duplicate rows
        idx_state = sorted(
            (r["vec_id"], r["list_id"], tuple(r["embedding"]))
            for r in read_ivf_index(spark, index)["assignments"]
            .collect()
        )
        return lake_state, idx_state

    reference = run_loop(str(tmp_path / "ref"))
    assert [v for v, _ in reference[0]] == [2, 4, 12, 22, 101, 102]
    assert [v for v, _, _ in reference[1]] == [2, 4, 12, 22, 101, 102]

    for crash_batch in range(3):
        for crash_mode in ("before_docs", "after_docs", "inside_append"):
            root = str(tmp_path / f"c{crash_batch}_{crash_mode}")
            got = run_loop(root, crash_batch, crash_mode)
            assert got == reference, (
                f"crash {crash_mode} in batch {crash_batch} diverged"
            )


def test_store_verify_pushes_id_filter_on_sorted_lake(spark, tmp_path):
    """VERDICT r6 item 1: with an id-clustered lake
    (append_log_idempotent(sort_col=...)), the store-path verify stage
    reaches the corpus text scan as a pushed literal In filter — the
    form parquet row-group stats can prune — and returns rows
    identical to the semi-join fallback."""
    import pyarrow.parquet as pq

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators import (
        text_dedup,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (
        append_log_idempotent,
    )

    lake = str(tmp_path / "lake")
    store = str(tmp_path / "store")
    rows = [(i, f"{W} number {i} with its own unique trailing words")
            for i in range(2000)]
    rows[7] = (7, X)  # the doc the batch will near-dup
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    assert append_log_idempotent(
        spark, corpus, lake, "b0", sort_col="doc_id", sort_files=4
    )
    text_dedup.write_lsh_signature_store(
        spark.read.parquet(lake).select("doc_id", "text"), store,
        num_hashes=16, bands=4,
    )
    # id-clustered layout: every row group spans a narrow id slice
    spans = []
    for f in glob.glob(f"{lake}/ingest_batch=b0/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "doc_id"
            )
            spans.append(col.statistics.max - col.statistics.min)
    assert spans and max(spans) < 2000 / 2

    st = text_dedup.read_lsh_signature_store(spark, store)
    batch = spark.createDataFrame(
        [(9001, X), (9002, U)], "doc_id long, text string"
    )
    lake_docs = spark.read.parquet(lake).select("doc_id", "text")
    out = text_dedup.minhash_near_duplicates_against(
        lake_docs, batch, threshold=0.7, num_hashes=16, bands=4,
        corpus_signatures=st["signatures"],
        corpus_buckets=st["buckets"],
    )
    pushed = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pushed == {(9001, 7)}
    # the verify's corpus text scan carries the pushed literal filter
    # for the CORPUS side of the pair set only: one id pushes as
    # EqualTo, several as In — and the batch ids (9001/9002) must not
    # appear in any pushed filter, where they would only widen the
    # row-group pruning range
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "EqualTo(doc_id,7)" in pf or "In(doc_id, [7" in pf
    assert "9001" not in pf and "9002" not in pf

    # fallback parity: force the semi-join path (bound -> 0)
    import unittest.mock as mock

    with mock.patch.object(text_dedup, "MAX_VERIFY_ID_PUSHDOWN", 0):
        out_sj = text_dedup.minhash_near_duplicates_against(
            lake_docs, batch, threshold=0.7, num_hashes=16, bands=4,
            corpus_signatures=st["signatures"],
            corpus_buckets=st["buckets"],
        )
        assert {
            (r["id_a"], r["id_b"]) for r in out_sj.collect()
        } == pushed
        plan_sj = out_sj._jdf.queryExecution().executedPlan().toString()
        assert "In(doc_id" not in plan_sj


def test_ingest_entrances_reject_null_ids(spark, tmp_path):
    """Both ingest faces fail LOUDLY on a NULL-id row at the entrance
    (review r8): a NULL id passes every keyed anti-join (NULL never
    equals a store id), lands in the lake — and then permanently wedges
    a streaming replay whose divergence probe can never match it."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        ingest_semantic_batch,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        ingest_dedup_batch,
        write_lsh_signature_store,
    )

    docs = spark.createDataFrame(
        [(1, X), (2, Y)], "doc_id long, text string"
    )
    store = str(tmp_path / "store")
    write_lsh_signature_store(docs, store)
    bad_docs = spark.createDataFrame(
        [(None, "brand new text here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="NULL doc_id"):
        ingest_dedup_batch(docs, bad_docs, store)

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    index = str(tmp_path / "ivf")
    write_ivf_index(vecs, index, n_lists=2)
    bad_vecs = spark.createDataFrame(
        [(None, [9.0, 9.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="NULL vec_id"):
        ingest_semantic_batch(bad_vecs, index)


def test_guarded_append_rejects_superset_and_debris_partitions(
    spark, tmp_path
):
    """The streaming divergence guard is TWO-directional (review r8):
    an old-era partition that happens to be a SUPERSET of the batch's
    ids must raise — a subset-only test would skip the doc write while
    the state append still landed (rows marked ingested that are in no
    corpus) — and a footerless debris partition raises the guided
    error, not a raw schema exception."""
    import os

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.dedup_ingest import (  # noqa: E501
        guarded_idempotent_append,
    )

    lake = str(tmp_path / "lake")
    old_era = spark.createDataFrame(
        [(i, f"old text {i}") for i in range(1, 6)],
        "doc_id long, text string",
    )
    guarded_idempotent_append(spark, old_era, lake, 0, "doc_id")

    # true replay: the SAME frame under the same id no-ops cleanly
    guarded_idempotent_append(spark, old_era, lake, 0, "doc_id")

    # new-era batch whose ids are a strict SUBSET of the old partition
    new_era = spark.createDataFrame(
        [(1, "new text 1"), (2, "new text 2")], "doc_id long, text string"
    )
    with pytest.raises(RuntimeError, match="never admitted"):
        guarded_idempotent_append(spark, new_era, lake, 0, "doc_id")

    # debris: a partition directory with no parquet footers
    os.makedirs(f"{lake}/ingest_batch=9")
    open(f"{lake}/ingest_batch=9/_SUCCESS", "w").close()
    with pytest.raises(RuntimeError, match="debris"):
        guarded_idempotent_append(spark, new_era, lake, 9, "doc_id")


def test_lsh_append_fenced_against_inflight_compaction(spark, tmp_path):
    """Writer fence (round-9 VERDICT item 2, mirroring the round-9 IVF
    fence): an append that would race compact_lsh_signature_store's
    staged rewrite/swap of either data table fails LOUDLY — the
    compaction's staging/backup directories double as the lease marker
    — instead of landing rows the swap silently discards.  The fence
    never deletes the debris (that would corrupt a LIVE compaction);
    the compaction entry point owns recovery, after which the append
    succeeds."""
    import shutil

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        compact_lsh_signature_store,
        write_lsh_signature_store,
    )

    store = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(101, X), (102, Y)], "doc_id long, text string"
    )
    write_lsh_signature_store(corpus, store, num_hashes=16, bands=4)
    batch = spark.createDataFrame([(5, U)], "doc_id long, text string")

    # staged rewrite in flight on signatures -> loud, nothing lands
    os.makedirs(os.path.join(store, "signatures__compacting"))
    with pytest.raises(ValueError, match="compaction in flight"):
        append_batch_signatures(batch, store)
    assert _store_ids(spark, store) == {101, 102}
    shutil.rmtree(os.path.join(store, "signatures__compacting"))

    # crashed mid-swap on buckets (backup dir present) -> loud too,
    # and the append's own lease must have been RELEASED on the way
    # out (the compaction below takes it)
    shutil.copytree(
        os.path.join(store, "buckets"), os.path.join(store, "buckets__old")
    )
    with pytest.raises(ValueError, match="compaction in flight"):
        append_batch_signatures(batch, store)
    assert not os.path.exists(store + "__lease")
    # the compaction entry point recovers the swap; the append lands
    compact_lsh_signature_store(spark, store, target_files=1)
    assert append_batch_signatures(batch, store) == 1
    assert _store_ids(spark, store) == {101, 102, 5}


def test_writer_lease_excludes_appends_and_self_heals(spark, tmp_path):
    """The writer lease (round-9 VERDICT item 5) upgrades the advisory
    fences to mutual exclusion on atomic-create filesystems: an append
    arriving while a maintenance run HOLDS the lease is excluded even
    before any staging directory exists — exactly the
    fence-TOCTOU window (staging appearing between the append's
    re-check and its parquet commit) the round-9 fence could not
    close.  Crash re-drives stay self-healing: a stale lease whose
    token matches the caller's own is broken and re-claimed, while a
    DIFFERENT writer's stale lease blocks loudly until that operation
    is re-run (its entry point releases cleanly) or an operator breaks
    it."""
    from contextlib import ExitStack

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        compact_lsh_signature_store,
        read_lsh_signature_store,
        write_lsh_signature_store,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        break_writer_lease,
        writer_lease,
    )

    store = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(101, X), (102, Y)], "doc_id long, text string"
    )
    write_lsh_signature_store(corpus, store, num_hashes=16, bands=4)
    batch = spark.createDataFrame([(5, U)], "doc_id long, text string")

    # maintenance holds the lease, NO staging exists yet (the TOCTOU
    # state) -> the append is excluded loudly, nothing lands
    with ExitStack() as stack:
        stack.enter_context(writer_lease(spark, store, "compact"))
        with pytest.raises(WriterLeaseHeld, match="compact"):
            append_batch_signatures(batch, store)
        assert _store_ids(spark, store) == {101, 102}
    # lease released -> the append lands
    assert append_batch_signatures(batch, store) == 1

    # hard-crashed append left its stale lease: maintenance is blocked
    # loudly (different token)...
    with open(store + "__lease", "w") as fh:
        fh.write("append")
    with pytest.raises(WriterLeaseHeld, match="append"):
        compact_lsh_signature_store(spark, store, target_files=1)
    # ...a YOUNG same-token lease is presumed LIVE (round-10 ADVICE:
    # the unconditional self-break let a re-drive racing a slow live
    # attempt break ITS lease, putting both inside the critical
    # section) — the re-drive is excluded loudly too...
    with pytest.raises(WriterLeaseHeld, match="presumed LIVE"):
        append_batch_signatures(batch, store)
    # ...until the lease AGES past the staleness window (simulated by
    # backdating the file's mtime): then the re-driven append
    # self-breaks its own token, no-ops on the id anti-join, and
    # releases cleanly...
    _backdate(store + "__lease")
    assert append_batch_signatures(batch, store) == 0
    assert not os.path.exists(store + "__lease")
    # ...after which maintenance proceeds
    res = compact_lsh_signature_store(spark, store, target_files=1)
    assert res["signatures"] >= 1
    assert _store_ids(spark, store) == {101, 102, 5}

    # the operator escape hatch also clears a stale lease
    with open(store + "__lease", "w") as fh:
        fh.write("compact")
    assert break_writer_lease(spark, store)
    assert append_batch_signatures(batch, store) == 0
    # store stays fully readable throughout
    assert read_lsh_signature_store(spark, store)["signatures"].count() == 3


def test_writer_lease_release_is_nonce_guarded(spark, tmp_path, caplog):
    """Release safety: the lease payload carries a per-acquisition
    nonce, and exit deletes the lease file only when the full payload
    is still its own.  Without the guard, a same-token re-drive that
    (wrongly) broke a LIVE holder's lease would then have ITS lease
    deleted by the victim's exit — re-opening the store to a third
    writer and compounding the original contract breach.  Round-12
    VERDICT item 2: the skip used to be SILENT; the victim's exit now
    sets the yielded handle's ``breached`` event and logs an ERROR
    naming both payloads."""
    import logging

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        writer_lease,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )
    root = str(tmp_path / "store")
    os.makedirs(root)
    breaker = "append\n0123456789abcdef"
    with writer_lease(spark, root, "append", heartbeat=False) as h:
        ours = open(root + "__lease").read()
        assert ours.split("\n")[0] == "append" and ours != breaker
        # simulate the breaker: overwrite with a different nonce
        with open(root + "__lease", "w") as fh:
            fh.write(breaker)
        assert not h.breached.is_set()
    # the victim exited without deleting the breaker's lease — and
    # LOUDLY: handle flagged, ERROR naming both payloads
    assert open(root + "__lease").read() == breaker
    assert h.breached.is_set()
    breach_logs = [
        r for r in caplog.records
        if r.levelno >= logging.ERROR
        and "NOT ours at release" in r.getMessage()
    ]
    assert breach_logs
    assert ours.split("\n")[1] in breach_logs[0].getMessage()
    assert "0123456789abcdef" in breach_logs[0].getMessage()
    # normal own-lease release still deletes, silently and unflagged
    os.remove(root + "__lease")
    with writer_lease(spark, root, "append") as h2:
        pass
    assert not os.path.exists(root + "__lease")
    assert not h2.breached.is_set()


def test_writer_lease_distinct_batch_tokens_never_self_break(
    spark, tmp_path
):
    """Round-10 ADVICE (medium): with the shared default token, a
    re-drive of batch B self-broke live batch A's lease and both
    entered the critical section.  The ingest loops now pass per-batch
    tokens (``append:{batch_id}``), and a DIFFERENT-token lease is
    never self-broken — young or stale — so two live batches on one
    store exclude each other loudly; only the SAME batch's own
    crashed lease self-heals (age-gated)."""
    from contextlib import ExitStack

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        append_batch_signatures,
        write_lsh_signature_store,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    store = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(101, X)], "doc_id long, text string"
    )
    write_lsh_signature_store(corpus, store, num_hashes=16, bands=4)
    batch = spark.createDataFrame([(5, U)], "doc_id long, text string")

    # live batch A holds append:1 -> batch B (append:2) is excluded
    # loudly, no self-break, nothing lands
    with ExitStack() as stack:
        stack.enter_context(writer_lease(spark, store, "append:1"))
        with pytest.raises(WriterLeaseHeld, match="append:1"):
            append_batch_signatures(
                batch, store, lease_token="append:2"
            )
        assert _store_ids(spark, store) == {101}
    # a CRASHED batch A lease (even stale) still never self-breaks
    # for batch B — recovery belongs to A's own re-drive
    with open(store + "__lease", "w") as fh:
        fh.write("append:1")
    _backdate(store + "__lease")
    with pytest.raises(WriterLeaseHeld, match="append:1"):
        append_batch_signatures(batch, store, lease_token="append:2")
    # ...while A's own re-drive self-breaks it and lands
    assert append_batch_signatures(
        batch, store, lease_token="append:1"
    ) == 1
    assert not os.path.exists(store + "__lease")
    assert _store_ids(spark, store) == {101, 5}


def test_writer_lease_empty_payload_self_clears_after_window(
    spark, tmp_path
):
    """Round-10 VERDICT item 3 (the claim-crash story): a writer that
    died between the atomic create and the payload write leaves an
    EMPTY lease no token can match.  Young, it is presumed to be a
    payload write in flight — every writer raises with guidance; once
    it ages past the staleness window, the next writer (ANY token)
    breaks it and proceeds, so the window no longer needs a manual
    break_writer_lease."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    open(root + "__lease", "w").close()  # claim-crash debris
    with pytest.raises(WriterLeaseHeld, match="self-clears"):
        with writer_lease(spark, root, "append:7"):
            pass
    _backdate(root + "__lease")
    with writer_lease(spark, root, "append:7"):
        assert open(root + "__lease").read().startswith("append:7\n")
    assert not os.path.exists(root + "__lease")


def test_writer_lease_claim_crash_cleanup_in_process(
    spark, tmp_path, monkeypatch
):
    """Round-10 ADVICE (low): an IN-PROCESS failure of the payload
    write (between createNewFile and the write) must drop the
    just-claimed lease before propagating — otherwise the process is
    alive but its empty lease wedges every writer (including itself)
    for the whole staleness window."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)

    def boom(fs, lease, payload):
        raise OSError("disk full")

    monkeypatch.setattr(writers, "_write_lease_payload", boom)
    with pytest.raises(OSError, match="disk full"):
        with writers.writer_lease(spark, root, "append:1"):
            pass
    assert not os.path.exists(root + "__lease")
    monkeypatch.undo()
    # the store is immediately claimable again
    with writers.writer_lease(spark, root, "append:1"):
        assert os.path.exists(root + "__lease")
    assert not os.path.exists(root + "__lease")


def test_stream_semantic_retrain_recovery_is_lease_guarded(
    spark, tmp_path
):
    """Round-10 ADVICE (low): the in-loop ``_recover_retrain_swap``
    MUTATES (deletes staging, restores backups), so it must not run
    while another writer is live — a bare recovery racing an offline
    retrain would delete the retrain's active staging directory.  The
    recover+probe+retrain block now holds the writer lease: a
    micro-batch arriving while a (young) foreign lease is held fails
    loudly instead of mutating."""
    import shutil as _sh

    from pyspark.errors import StreamingQueryException

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        read_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.semantic_ingest import (  # noqa: E501
        stream_vectors_semantic_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    lake = str(tmp_path / "lake")
    index = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    corpus = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    write_ivf_index(corpus, index, n_lists=2)

    staging = str(tmp_path / "_stage")
    spark.createDataFrame(
        [(100, [2.0, -1.0])], "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    _sh.copy(glob.glob(f"{staging}/part-*.parquet")[0],
             raw / "b0.parquet")

    # a live offline retrain holds the lease (young, foreign nonce)
    with open(index + "__lease", "w") as fh:
        fh.write("retrain\nffffffffffffffff")
    q = stream_vectors_semantic_ingest(
        spark, str(raw), lake, index, ckpt,
        threshold=0.999, max_files_per_trigger=1,
        retrain_on_skew=100.0,  # probe path runs, trigger never fires
    )
    with pytest.raises(StreamingQueryException, match="retrain"):
        q.awaitTermination(300)
    # nothing mutated: index intact, nothing admitted to the lake
    assert read_ivf_index(spark, index)["assignments"].count() == 6
    assert not os.path.exists(lake)
    os.remove(index + "__lease")


def test_maintenance_lease_staleness_knob_passes_through(
    spark, tmp_path
):
    """Maintenance runs can outlive the 60 s default window at scale
    (a full-corpus retrain or compaction is minutes at 100 TB), so the
    entry points expose ``lease_stale_after_s`` and thread it into the
    writer lease: sized small, a same-token crashed lease self-breaks
    immediately; left at default, a fresh same-token lease is
    presumed LIVE and the re-run is excluded loudly."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.text_dedup import (  # noqa: E501
        compact_lsh_signature_store,
        write_lsh_signature_store,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
    )

    store = str(tmp_path / "store")
    corpus = spark.createDataFrame(
        [(101, X), (102, Y)], "doc_id long, text string"
    )
    write_lsh_signature_store(corpus, store, num_hashes=16, bands=4)

    with open(store + "__lease", "w") as fh:
        fh.write("compact")
    with pytest.raises(WriterLeaseHeld, match="presumed LIVE"):
        compact_lsh_signature_store(spark, store, target_files=1)
    res = compact_lsh_signature_store(
        spark, store, target_files=1, lease_stale_after_s=0.0
    )
    assert res["signatures"] >= 1
    assert not os.path.exists(store + "__lease")


def test_writer_lease_heartbeat_keeps_long_holder_live(spark, tmp_path):
    """Round-11 VERDICT item 1 (the liveness demand): the staleness
    window used to measure CLAIM age, so any critical section longer
    than the window made a live holder's lease breakable by a
    same-token contender (a re-drive racing a slow live attempt — both
    end up inside).  The holder now heartbeats the lease mtime every
    ``stale/3``, so a holder whose critical section EXCEEDS the window
    still looks live and the contender raises instead of breaking."""
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    # window 4s / beat 1.33s / hold 5s: the contender only breaks if
    # EVERY beat slips >4s — generous margins for slow-box days
    with writer_lease(spark, root, "append:1", stale_after_s=4.0):
        time.sleep(5.0)  # critical section outlives the window
        # ~3 beats refreshed the mtime: a same-token contender sees a
        # LIVE lease, never the old age-out break
        with pytest.raises(WriterLeaseHeld, match="presumed LIVE"):
            with writer_lease(
                spark, root, "append:1", stale_after_s=4.0
            ):
                pass
        # mtime really is fresh (the beat, not FS accident)
        assert time.time() - os.path.getmtime(root + "__lease") < 4.0
    assert not os.path.exists(root + "__lease")
    # opt-out restores the documented aging semantics: with the beat
    # off, the same long holder's lease ages out and IS self-broken
    with writer_lease(
        spark, root, "append:1", stale_after_s=1.0, heartbeat=False
    ):
        time.sleep(1.5)
        with writer_lease(spark, root, "append:1", stale_after_s=1.0):
            pass  # broke the (aged, heartbeat-less) holder's lease
    # the victim's nonce-guarded release left nothing behind either
    assert not os.path.exists(root + "__lease")


def test_writer_lease_break_is_atomic_and_reverifies(
    spark, tmp_path, monkeypatch
):
    """Round-11 ADVICE (medium): the break was delete-then-claim — two
    concurrent breakers could both pass the age gate and the slower
    delete removed the faster one's freshly-claimed LIVE lease.  The
    break is now an atomic RENAME capture (exactly one breaker wins)
    followed by a payload+age RE-verify on the captured file: a lease
    that changed between the probe and the rename (holder heartbeat
    landed) is renamed back and the breaker raises."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"
    with open(lease_file, "w") as fh:
        fh.write("append:1\n0123456789abcdef")
    _backdate(lease_file)

    # simulate the holder's heartbeat landing between the contender's
    # staleness probe and its rename: the probe on the ORIGINAL path
    # reads stale, the re-verify on the CAPTURED file reads fresh
    real_age = writers._lease_age_s

    def staggered_age(fs, lease):
        if ".breaking." in lease.toString():
            return 0.1  # the re-verify: heartbeat landed, lease fresh
        return real_age(fs, lease)

    monkeypatch.setattr(writers, "_lease_age_s", staggered_age)
    with pytest.raises(
        writers.WriterLeaseHeld, match="between the staleness probe"
    ):
        with writers.writer_lease(spark, root, "append:1"):
            pass
    monkeypatch.undo()
    # the break was aborted and the lease RESTORED byte-identically;
    # no capture debris left behind.  (The restore re-creates the
    # file — POSIX rename-back would clobber a fresh claim — so its
    # mtime is fresh: a justified break is delayed by one window, the
    # safe direction; re-backdate to continue the scenario.)
    assert open(lease_file).read() == "append:1\n0123456789abcdef"
    assert not glob.glob(lease_file + ".breaking.*")
    _backdate(lease_file)
    # without the simulated heartbeat the same stale lease breaks
    # atomically and the re-drive proceeds
    with writers.writer_lease(spark, root, "append:1"):
        assert open(lease_file).read().startswith("append:1\n")
    assert not os.path.exists(lease_file)
    assert not glob.glob(lease_file + ".breaking.*")


def test_writer_lease_break_race_lost_falls_back_to_claim(
    spark, tmp_path, monkeypatch
):
    """When another breaker wins the rename race, the loser must NOT
    delete anything (the old delete-then-claim bug): it falls back to
    a plain claim — succeeding if the winner already broke+released,
    raising loudly if the winner (or anyone) holds the lease."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"

    # winner broke the debris AND released before our retry: claim ok
    with open(lease_file, "w") as fh:
        fh.write("append:1\nffffffffffffffff")
    _backdate(lease_file)

    def lose_race_released(jvm, fs, lease, held, stale):
        os.remove(lease_file)  # the winner captured + discarded it
        return False

    monkeypatch.setattr(
        writers, "_capture_stale_lease", lose_race_released
    )
    with writers.writer_lease(spark, root, "append:1"):
        assert os.path.exists(lease_file)
    monkeypatch.undo()

    # winner broke the debris and CLAIMED: the loser raises, and the
    # winner's live lease survives untouched
    with open(lease_file, "w") as fh:
        fh.write("append:1\nffffffffffffffff")
    _backdate(lease_file)

    def lose_race_claimed(jvm, fs, lease, held, stale):
        with open(lease_file, "w") as fh2:
            fh2.write("append:1\neeeeeeeeeeeeeeee")  # winner's claim
        return False

    monkeypatch.setattr(
        writers, "_capture_stale_lease", lose_race_claimed
    )
    with pytest.raises(
        writers.WriterLeaseHeld, match="lost the rename race"
    ):
        with writers.writer_lease(spark, root, "append:1"):
            pass
    assert open(lease_file).read() == "append:1\neeeeeeeeeeeeeeee"
    os.remove(lease_file)


def test_writer_lease_unreadable_payload_never_breaks(
    spark, tmp_path, monkeypatch
):
    """Round-11 ADVICE (low): a payload READ FAILURE used to collapse
    into '' — indistinguishable from claim-crash debris — so one
    transient IO error against a live long-running holder (older than
    the window, as long jobs are) got its lease silently broken.  An
    unreadable payload now raises loudly at ANY age and never breaks,
    regardless of token."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"
    payload = "append:1\n0123456789abcdef"
    with open(lease_file, "w") as fh:
        fh.write(payload)
    _backdate(lease_file)  # well past the window — breakable if debris

    monkeypatch.setattr(
        writers, "_read_lease_payload", lambda jvm, fs, lease: None
    )
    with pytest.raises(
        writers.WriterLeaseHeld, match="could not be read"
    ):
        with writers.writer_lease(spark, root, "append:1"):
            pass
    monkeypatch.undo()
    # nothing was broken: the holder's lease is intact
    assert open(lease_file).read() == payload
    # once readable again, the stale same-token lease self-heals
    with writers.writer_lease(spark, root, "append:1"):
        pass
    assert not os.path.exists(lease_file)


def test_stream_semantic_ingest_lease_staleness_knob(spark, tmp_path):
    """Round-11 ADVICE (medium): the in-loop recover+probe+retrain
    lease hard-coded the 60 s default window, so a hard-killed loop's
    'retrain' lease blocked its own restart for a full minute.
    ``stream_vectors_semantic_ingest`` now threads
    ``lease_stale_after_s`` into the in-loop lease (and compaction and
    the per-batch append): sized to 0, the restarted loop self-breaks
    its predecessor's crashed lease immediately and the batch lands."""
    import shutil as _sh

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.similarity import (  # noqa: E501
        read_ivf_index,
        write_ivf_index,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.streaming.semantic_ingest import (  # noqa: E501
        stream_vectors_semantic_ingest,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    lake = str(tmp_path / "lake")
    index = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    corpus = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    write_ivf_index(corpus, index, n_lists=2)

    staging = str(tmp_path / "_stage")
    spark.createDataFrame(
        [(100, [2.0, -1.0])], "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    _sh.copy(glob.glob(f"{staging}/part-*.parquet")[0],
             raw / "b0.parquet")

    # a hard-killed predecessor left a YOUNG same-token retrain lease
    with open(index + "__lease", "w") as fh:
        fh.write("retrain\nffffffffffffffff")
    q = stream_vectors_semantic_ingest(
        spark, str(raw), lake, index, ckpt,
        threshold=0.999, max_files_per_trigger=1,
        retrain_on_skew=100.0,  # probe path runs, trigger never fires
        lease_stale_after_s=0.0,
    )
    q.awaitTermination(300)
    # the restarted loop self-broke the crashed lease and proceeded:
    # the batch vector was admitted to both the lake and the index
    assert read_ivf_index(spark, index)["assignments"].count() == 7
    assert spark.read.parquet(lake).count() == 1
    assert not os.path.exists(index + "__lease")


def test_writer_lease_mutual_exclusion_under_real_contention(
    spark, tmp_path
):
    """Stress the lease with REAL concurrency (the prior race tests
    simulate interleavings via monkeypatch; this one lets 8 driver
    threads genuinely race): seeded stale same-token debris makes the
    first wave exercise the atomic rename break concurrently (exactly
    one breaker may win), and every subsequent hand-off races claim
    against release.  Invariants: never two holders inside at once,
    all 8 workers eventually complete, and the store ends clean — no
    lease file, no `.breaking.` capture debris."""
    import threading
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    with open(root + "__lease", "w") as fh:
        fh.write("append:0")  # crashed predecessor, same token
    _backdate(root + "__lease")

    lock = threading.Lock()
    inside: list[int] = []
    max_inside = [0]
    done: list[int] = []
    errors: list = []

    def worker(i: int) -> None:
        deadline = time.time() + 90
        while True:
            try:
                with writer_lease(
                    spark, root, "append:0", stale_after_s=30.0
                ):
                    with lock:
                        inside.append(i)
                        max_inside[0] = max(max_inside[0], len(inside))
                    time.sleep(0.05)
                    with lock:
                        inside.remove(i)
                done.append(i)
                return
            except WriterLeaseHeld:
                if time.time() > deadline:
                    errors.append((i, "timed out contending"))
                    return
                time.sleep(0.02)
            except Exception as e:  # noqa: BLE001 - fail the test loudly
                errors.append((i, repr(e)))
                return

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(180)
    assert not errors, errors
    assert sorted(done) == list(range(8))
    assert max_inside[0] == 1, (
        f"{max_inside[0]} writers inside the critical section at once"
    )
    assert not os.path.exists(root + "__lease")
    assert not glob.glob(root + "__lease.breaking.*")


def test_writer_lease_break_parks_capture_when_path_reclaimed(
    spark, tmp_path, monkeypatch
):
    """The last break branch: a breaker captures a lease, the
    re-verify says it is LIVE (not the judged debris), and a THIRD
    writer claims the original path before the restore — re-creating
    the path would now clobber that fresh claim, so the breaker must
    park the capture and raise naming both, never silently proceed."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"
    debris = "append:1\n0123456789abcdef"
    with open(lease_file, "w") as fh:
        fh.write(debris)
    _backdate(lease_file)

    # the capture re-verify reads FRESH (a heartbeat landed) so the
    # restore path runs...
    real_age = writers._lease_age_s

    def staggered_age(fs, lease):
        if ".breaking." in lease.toString():
            return 0.1
        return real_age(fs, lease)

    # ...and the restore's atomic claim loses: a third writer owns the
    # path (only the RESTORE payload — the captured debris — is
    # refused; the contender's own claim payloads carry fresh nonces)
    real_claim = writers._atomic_claim

    def third_writer_owns_path(jvm, fs, lease, payload):
        if payload == debris:
            return False
        return real_claim(jvm, fs, lease, payload)

    monkeypatch.setattr(writers, "_lease_age_s", staggered_age)
    monkeypatch.setattr(writers, "_atomic_claim", third_writer_owns_path)
    with pytest.raises(writers.WriterLeaseHeld, match="parked at"):
        with writers.writer_lease(spark, root, "append:1"):
            pass
    monkeypatch.undo()
    # the captured lease is parked (payload intact) for the operator;
    # the original path stays free for the (simulated) third writer
    parked = glob.glob(lease_file + ".breaking.*")
    assert len(parked) == 1
    assert open(parked[0]).read() == debris
    os.remove(parked[0])


def test_writer_lease_heartbeat_never_refreshes_usurper(
    spark, tmp_path, caplog
):
    """The beat reads the payload before touching: if our lease was
    (wrongly) usurped mid-hold, the beat must NOT refresh the
    usurper's mtime — keeping a foreign lease alive would extend the
    very breach it suffered.  Round-12 VERDICT item 2: the beat used
    to detect the usurpation and silently stop; it now sets the
    yielded handle's ``breached`` event and logs an ERROR naming both
    payloads, so an actual single-writer breach is visible to the
    holder and in the logs."""
    import logging
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        writer_lease,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )
    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"
    usurper = "append:1\nffffffffffffffff"
    with writer_lease(spark, root, "append:1", stale_after_s=1.5) as h:
        ours = open(lease_file).read()
        assert not h.breached.is_set()
        # usurp: overwrite with a foreign payload and backdate it
        with open(lease_file, "w") as fh:
            fh.write(usurper)
        old = os.path.getmtime(lease_file) - 50.0
        os.utime(lease_file, (old, old))
        time.sleep(1.3)  # >= 2 beat intervals (0.5 s each)
        # the beats saw a foreign payload and never touched the file
        assert abs(os.path.getmtime(lease_file) - old) < 0.5
        # ...and the breach is LOUD: handle flagged, ERROR logged
        # naming both payloads (wait out beat scheduling jitter)
        assert h.breached.wait(5.0)
    # nonce-guarded release left the usurper's file in place
    assert open(lease_file).read() == usurper
    breach_logs = [
        r for r in caplog.records
        if r.levelno >= logging.ERROR and "USURPED" in r.getMessage()
    ]
    assert breach_logs, "usurpation must log at ERROR"
    assert ours.split("\n")[1] in breach_logs[0].getMessage()
    assert "ffffffffffffffff" in breach_logs[0].getMessage()


def test_writer_lease_degrades_to_claim_age_without_settimes(
    spark, tmp_path, monkeypatch
):
    """Documented degradation: when every ``setTimes`` fails (here a
    plain Python exception — no ``java_exception`` type, so the beat
    classifies it TRANSIENT and keeps retrying rather than stopping,
    round-12 ADVICE), the mtime is never refreshed, the lease ages as
    claim age (the pre-round-12 behavior), and the age-gated
    self-break still recovers a crashed same-token lease — degraded,
    never wedged.  The permanent-stop path needs the Java
    ``UnsupportedOperationException`` type — see
    test_writer_lease_heartbeat_stops_once_on_unsupported_settimes."""
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    def no_settimes(fs, lease):
        raise OSError("setTimes not supported")

    monkeypatch.setattr(writers, "_touch_lease", no_settimes)
    root = str(tmp_path / "store")
    os.makedirs(root)
    with writers.writer_lease(spark, root, "append:1", stale_after_s=1.0):
        time.sleep(1.4)  # outlives the window; beats all fail
        # claim-age fallback: the same-token contender CAN break the
        # aged lease (old semantics) — both inside is the documented
        # cost of no setTimes + an undersized window, loud in the log
        with writers.writer_lease(
            spark, root, "append:1", stale_after_s=1.0
        ):
            pass
    assert not os.path.exists(root + "__lease")


def test_break_writer_lease_sweeps_claim_and_capture_debris(
    spark, tmp_path
):
    """The operator escape hatch resets EVERYTHING a hard-killed
    writer can leave: the lease itself, a dead claimant's `.claim.`
    temp, and a dead breaker's (or parked) `.breaking.` capture —
    after the sweep the store claims cleanly."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        break_writer_lease,
        writer_lease,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    with open(root + "__lease", "w") as fh:
        fh.write("append:1\nffffffffffffffff")
    open(root + "__lease.claim.deadbeef00000000", "w").close()
    with open(root + "__lease.breaking.feedface00000000", "w") as fh:
        fh.write("compact\n1111111111111111")

    assert break_writer_lease(spark, root)
    assert not glob.glob(root + "__lease*")
    with writer_lease(spark, root, "append:1"):
        pass
    assert not glob.glob(root + "__lease*")


def test_writer_lease_heartbeat_survives_transient_touch_failures(
    spark, tmp_path, monkeypatch
):
    """Round-12 ADVICE (medium): the beat used to exit permanently on
    the FIRST ``setTimes`` exception of any kind, so one transient IO
    failure silently degraded a live long-running holder to claim-age
    staleness — the race the heartbeat exists to close.  A transient
    failure now skips that beat and retries: after two injected
    failures the next beats succeed and the mtime is fresh again, so
    a same-token contender still sees a LIVE lease."""
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    real_touch = writers._touch_lease
    calls = {"n": 0}

    def flaky_touch(fs, lease):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise OSError("transient IO failure")
        real_touch(fs, lease)

    monkeypatch.setattr(writers, "_touch_lease", flaky_touch)
    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"
    with writers.writer_lease(
        spark, root, "append:1", stale_after_s=1.5
    ) as h:
        # interval 0.5s: beats 1-2 fail (skipped), beat 3+ succeeds
        deadline = time.time() + 10.0
        while calls["n"] < 3 and time.time() < deadline:
            time.sleep(0.1)
        assert calls["n"] >= 3, "beat thread stopped after a transient"
        time.sleep(0.6)  # let a post-recovery beat land
        # the beat recovered: mtime is fresh despite the two failures
        assert time.time() - os.path.getmtime(lease_file) < 1.5
        # and a same-token contender is still excluded as LIVE
        with pytest.raises(
            writers.WriterLeaseHeld, match="presumed LIVE"
        ):
            with writers.writer_lease(
                spark, root, "append:1", stale_after_s=1.5
            ):
                pass
    assert not h.breached.is_set()
    assert not os.path.exists(lease_file)


def test_writer_lease_heartbeat_gives_up_loudly_after_misses(
    spark, tmp_path, monkeypatch, caplog
):
    """Round-12 ADVICE (medium), the give-up bound: persistent
    transient failures must not retry forever — after
    WRITER_LEASE_BEAT_GIVE_UP consecutive missed beats (two full
    staleness windows) the beat gives up with an ERROR log so the
    degradation to claim-age staleness is visible, not silent."""
    import logging
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )
    calls = {"n": 0}

    def always_fails(fs, lease):
        calls["n"] += 1
        raise OSError("persistent transient-looking failure")

    monkeypatch.setattr(writers, "_touch_lease", always_fails)
    root = str(tmp_path / "store")
    os.makedirs(root)
    with writers.writer_lease(
        spark, root, "append:1", stale_after_s=1.5
    ) as h:
        # interval 0.5s x 6 misses = ~3s to the give-up; generous
        # deadline for slow-box scheduling
        deadline = time.time() + 20.0
        while time.time() < deadline:
            if any(
                r.levelno >= logging.ERROR
                and "giving up" in r.getMessage()
                for r in caplog.records
            ):
                break
            time.sleep(0.2)
        giveups = [
            r for r in caplog.records
            if r.levelno >= logging.ERROR
            and "giving up" in r.getMessage()
        ]
        assert giveups, "beat must give up LOUDLY after the bound"
        n_at_giveup = calls["n"]
        assert n_at_giveup >= writers.WRITER_LEASE_BEAT_GIVE_UP
        time.sleep(1.2)  # two more would-be intervals
        assert calls["n"] == n_at_giveup, "beat kept running past give-up"
    # give-up is a degradation, not a breach: the flag stays clear and
    # the holder's own release still deletes its (aged) lease
    assert not h.breached.is_set()
    assert not os.path.exists(root + "__lease")


def test_writer_lease_heartbeat_stops_once_on_unsupported_settimes(
    spark, tmp_path, monkeypatch, caplog
):
    """The PERMANENT beat stop is reserved for a filesystem that
    genuinely lacks ``setTimes`` — identified by the Java exception
    TYPE (``UnsupportedOperationException``), the same technique
    ``_atomic_claim`` uses for EEXIST — because retrying an
    unsupported call can never succeed.  One attempt, one WARNING,
    done."""
    import logging
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )

    class _JClass:
        def getName(self):
            return "java.lang.UnsupportedOperationException"

    class _JExc:
        def getClass(self):
            return _JClass()

    calls = {"n": 0}

    def unsupported(fs, lease):
        calls["n"] += 1
        e = OSError("setTimes not supported by this FileSystem")
        e.java_exception = _JExc()
        raise e

    monkeypatch.setattr(writers, "_touch_lease", unsupported)
    root = str(tmp_path / "store")
    os.makedirs(root)
    with writers.writer_lease(
        spark, root, "append:1", stale_after_s=1.5
    ) as h:
        deadline = time.time() + 10.0
        while calls["n"] < 1 and time.time() < deadline:
            time.sleep(0.1)
        assert calls["n"] == 1
        time.sleep(1.2)  # two more would-be intervals
        assert calls["n"] == 1, "unsupported setTimes must stop the beat"
    assert not h.breached.is_set()  # degradation, not a breach
    warns = [
        r for r in caplog.records
        if r.levelno == logging.WARNING
        and "without setTimes" in r.getMessage()
    ]
    assert len(warns) == 1
    assert not os.path.exists(root + "__lease")


def test_writer_lease_release_unreadable_payload_warns_no_delete(
    spark, tmp_path, monkeypatch, caplog
):
    """Round-12 ADVICE (low): release used to retry a transient
    payload read exactly once (0.2 s) and then SILENTLY skip the
    delete — the orphaned lease then blocked every different-token
    writer for a full stale window with nothing in the logs.  Release
    now retries with backoff and, when it still cannot identify the
    payload, exits without deleting but logs a WARNING pointing at
    the WriterLeaseHeld window to expect."""
    import logging

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )
    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"
    with writers.writer_lease(
        spark, root, "append:1", heartbeat=False
    ) as h:
        payload = open(lease_file).read()
        monkeypatch.setattr(
            writers, "_read_lease_payload",
            lambda jvm, fs, lease: None,
        )
    monkeypatch.undo()
    # not deleted (could be someone else's), not flagged as a breach
    # (unknown is not evidence of usurpation), but LOUD
    assert open(lease_file).read() == payload
    assert not h.breached.is_set()
    warns = [
        r for r in caplog.records
        if r.levelno == logging.WARNING
        and "WITHOUT deleting" in r.getMessage()
    ]
    assert warns
    os.remove(lease_file)


def test_writer_lease_release_vanished_lease_is_loud(
    spark, tmp_path, caplog
):
    """A lease file GONE at exit means someone captured-and-discarded
    it (or ran break_writer_lease) while we were inside the critical
    section — mutual exclusion may have been violated, so the exit
    sets ``breached`` and logs an ERROR instead of silently noticing
    nothing."""
    import logging

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        writer_lease,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )
    root = str(tmp_path / "store")
    os.makedirs(root)
    with writer_lease(spark, root, "append:1", heartbeat=False) as h:
        os.remove(root + "__lease")  # simulated mid-hold manual break
    assert h.breached.is_set()
    errs = [
        r for r in caplog.records
        if r.levelno >= logging.ERROR and "VANISHED" in r.getMessage()
    ]
    assert errs


def test_writer_lease_capture_racing_live_beat_aborts_and_recovers(
    spark, tmp_path, monkeypatch
):
    """Deterministic beat-vs-break interleaving (round-12 VERDICT item
    7): a contender whose staleness PROBE misfires (here: forced to
    read the original path as ancient) rename-captures a LIVE beating
    holder's lease.  The capture's re-verify reads the REAL mtime —
    fresh, thanks to the beats — so the break aborts and restores, the
    contender raises, and the holder's beat, which may have seen the
    lease vanish during the capture window, recovers on the restored
    file: no breach flag, fresh mtime, clean release."""
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    lease_file = root + "__lease"

    real_age = writers._lease_age_s

    def probe_misfires(fs, lease):
        if ".breaking." in lease.toString():
            return real_age(fs, lease)  # the re-verify reads REALITY
        return 9999.0  # the probe wrongly judges the lease stale

    with writers.writer_lease(
        spark, root, "append:1", stale_after_s=2.0
    ) as h:
        with monkeypatch.context() as mp:
            mp.setattr(writers, "_lease_age_s", probe_misfires)
            with pytest.raises(
                writers.WriterLeaseHeld,
                match="between the staleness probe",
            ):
                with writers.writer_lease(
                    spark, root, "append:1", stale_after_s=2.0
                ):
                    pass
        # the holder's lease survived the capture/restore round-trip
        assert os.path.exists(lease_file)
        assert not glob.glob(lease_file + ".breaking.*")
        time.sleep(1.5)  # >= 2 beat intervals (0.667 s each)
        # the beat recovered on the restored file: mtime fresh, no
        # breach (the restored payload is OURS, not a usurper's)
        assert time.time() - os.path.getmtime(lease_file) < 2.0
        assert not h.breached.is_set()
    assert not h.breached.is_set()
    assert not os.path.exists(lease_file)
    assert not glob.glob(lease_file + ".breaking.*")


def test_writer_lease_beat_vs_breakers_real_contention(spark, tmp_path):
    """Round-12 VERDICT item 7: the 8-thread stress test used a 30 s
    window with ~50 ms holds, so the heartbeat never actually raced a
    breaker.  Here the ratio flips: ONE holder with a multi-second
    critical section under a window it outlives (4 s window, ~1.33 s
    beats, 5 s hold) while four contender threads hammer same-token
    claims the whole time — hundreds of genuinely concurrent
    probe/claim/break attempts against a live beating holder.
    Invariants: no contender ever gets inside (every attempt raises
    WriterLeaseHeld), the holder is never breached, and the store
    ends clean with no capture debris."""
    import threading
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    stop = threading.Event()
    attempts = [0] * 4
    violations: list = []
    errors: list = []

    def contender(i: int) -> None:
        while not stop.is_set():
            try:
                with writer_lease(
                    spark, root, "append:0", stale_after_s=4.0
                ):
                    violations.append(i)
                    return
            except WriterLeaseHeld:
                attempts[i] += 1
                time.sleep(0.01)
            except Exception as e:  # noqa: BLE001 - fail loudly
                errors.append((i, repr(e)))
                return

    with writer_lease(spark, root, "append:0", stale_after_s=4.0) as h:
        threads = [
            threading.Thread(target=contender, args=(i,))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        time.sleep(5.0)  # the critical section outlives the window
        stop.set()  # BEFORE release: post-release claims would be legal
        for t in threads:
            t.join(60)
        assert not errors, errors
        assert not violations, (
            f"contenders {violations} entered a live holder's section"
        )
        assert sum(attempts) >= 20, (
            f"only {sum(attempts)} contention trials — not a stress"
        )
        assert not h.breached.is_set()
    assert not h.breached.is_set()
    assert not os.path.exists(root + "__lease")
    assert not glob.glob(root + "__lease.breaking.*")


def test_writer_lease_beat_vs_breakers_subsecond_window(spark, tmp_path):
    """Round-12 VERDICT item 7 residual (carried through r13): the
    4 s-window stress above leaves the beat and the breaker's age
    probe ~1.3 s apart; with a SUB-SECOND window (0.75 s, beats every
    0.25 s) they interleave at the protocol's sharpest granularity —
    every contender probe races a beat that landed at most 250 ms
    ago, and a breaker's capture/rename-aside can overlap a beat's
    payload read (the transient-miss path) tens of times per hold.

    The invariant asserted is the protocol's REAL one, not "nobody
    breaks": a driver pause spanning the whole window is documented
    as indistinguishable from a crash, so a break IS legal then — but
    it must be LOUD.  Either no contender ever gets inside and the
    holder is unbreached, or a contender got inside and the holder's
    ``breached`` event fired (heartbeat-found-foreign-payload or
    release-found-foreign/missing).  Silent double-entry — a
    violation with ``breached`` unset — is the only failure."""
    import threading
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.writers import (  # noqa: E501
        WriterLeaseHeld,
        writer_lease,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    stop = threading.Event()
    attempts = [0] * 4
    entered: list = []
    errors: list = []

    def contender(i: int) -> None:
        while not stop.is_set():
            try:
                with writer_lease(
                    spark, root, "append:0", stale_after_s=0.75
                ):
                    entered.append(i)
                    return
            except WriterLeaseHeld:
                attempts[i] += 1
                time.sleep(0.005)
            except Exception as e:  # noqa: BLE001 - fail loudly
                errors.append((i, repr(e)))
                return

    with writer_lease(spark, root, "append:0", stale_after_s=0.75) as h:
        threads = [
            threading.Thread(target=contender, args=(i,))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        time.sleep(3.0)  # ~12 beat periods, hundreds of probe races
        stop.set()
        for t in threads:
            t.join(60)
        assert not errors, errors
        assert sum(attempts) >= 50, (
            f"only {sum(attempts)} contention trials — not a stress"
        )
    # breach detection may land on the holder's NEXT beat or at its
    # release (both loud paths) — judge it after the context exits
    if entered:
        # legal only as a LOUD break of a stale-looking holder
        assert h.breached.is_set(), (
            f"contenders {entered} entered silently — breached "
            "event never fired"
        )
    else:
        assert not h.breached.is_set()
        assert not os.path.exists(root + "__lease")
    assert not glob.glob(root + "__lease.breaking.*")


def test_writer_lease_heartbeat_gives_up_loudly_on_read_misses(
    spark, tmp_path, monkeypatch, caplog
):
    """The give-up bound's OTHER input: consecutive payload-read
    misses (transient IO, or the lease held off-path far longer than
    a capture/restore round-trip should take).  The beat skips each
    missed read and, after WRITER_LEASE_BEAT_GIVE_UP in a row, stops
    with the same loud ERROR as the touch-failure path — and read
    misses are not breach evidence, so the flag stays clear."""
    import logging
    import time

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources import (
        writers,
    )

    caplog.set_level(
        logging.INFO,
        logger="enterprise_sales_data_pipeline_using_aws_lambda_spark"
               ".sources.writers",
    )
    root = str(tmp_path / "store")
    os.makedirs(root)
    with writers.writer_lease(
        spark, root, "append:1", stale_after_s=1.5
    ) as h:
        # from here every beat read returns None (the claim already
        # happened; release undoes the patch before its own read)
        monkeypatch.setattr(
            writers, "_read_lease_payload",
            lambda jvm, fs, lease: None,
        )
        deadline = time.time() + 20.0
        while time.time() < deadline:
            if any(
                r.levelno >= logging.ERROR
                and "giving up" in r.getMessage()
                for r in caplog.records
            ):
                break
            time.sleep(0.2)
        giveups = [
            r for r in caplog.records
            if r.levelno >= logging.ERROR
            and "giving up" in r.getMessage()
        ]
        assert giveups, "read-miss path must reach the loud give-up"
        assert "unreadable" in giveups[0].getMessage()
        monkeypatch.undo()
    assert not h.breached.is_set()
    assert not os.path.exists(root + "__lease")
