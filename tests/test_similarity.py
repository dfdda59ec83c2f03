"""Similarity search: brute-force correctness + ANN recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter(F.col("vec_id") == 0).collect()[0]
    return [float(v) for v in row["embedding"]]


def _numpy_topk(emb, qvec, k):
    rows = emb.select("vec_id", "embedding").collect()
    q = np.array(qvec)
    scored = []
    for r in rows:
        v = np.array(r["embedding"], dtype="float64")
        scored.append((float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), r["vec_id"]))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in scored[:k]]


def test_bruteforce_topk_matches_numpy(emb, qvec):
    got = [r["vec_id"] for r in similarity.cosine_topk(emb, qvec, k=10).collect()]
    assert got == _numpy_topk(emb, qvec, 10)
    assert got[0] == 0  # the query vector itself is its own nearest neighbor


def test_threshold_set(emb, qvec):
    got = {r["vec_id"]: r["cos_sim"] for r in similarity.cosine_threshold(emb, qvec, 0.3).collect()}
    assert 0 in got and got[0] == pytest.approx(1.0)
    assert all(v >= 0.3 for v in got.values())


def test_ann_finds_exact_match(emb, qvec):
    """The query's own vector shares its bucket by construction."""
    bucketed = similarity.with_ann_bucket(emb, dim=len(qvec), bits=8).cache()
    ann = [r["vec_id"] for r in similarity.ann_topk(bucketed, qvec, k=10, bits=8, n_probes=8).collect()]
    assert ann and ann[0] == 0
    bucketed.unpersist()


def test_ann_recall_on_clustered_data(spark):
    """On clusterable data (10 tight clusters ×20 members) LSH-probed
    top-k must recover ≥90% of the true top-10 — random-hyperplane LSH
    is the scale path exactly for data with real neighborhoods."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(10, 32))
    rows = []
    for cid in range(10):
        for j in range(20):
            v = centers[cid] + rng.normal(scale=0.05, size=32)
            rows.append((cid * 20 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    q = rows[0][1]  # member of cluster 0
    truth = _numpy_topk(df, q, 10)
    bucketed = similarity.with_ann_bucket(df, dim=32, bits=8).cache()
    ann = [r["vec_id"] for r in similarity.ann_topk(bucketed, q, k=10, bits=8, n_probes=8).collect()]
    assert len(set(ann) & set(truth)) / 10 >= 0.9
    df.unpersist()
    bucketed.unpersist()


def test_embedding_lsh_pairs_recall_and_precision(emb, qvec):
    """OR-of-bands LSH pair candidates: subset of exact pairs (the
    cosine verify removes false positives) with recall ≥ 60% at the
    bench config (theory ≈ 83% at cos 0.5, 4 bits × 8 bands)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs_exact(emb, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs_lsh(
            emb, threshold=0.5, dim=len(qvec), bits=4, n_bands=8
        ).collect()
    }
    assert lsh.issubset(exact)
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.6


def test_dim_mismatch_fails_fast(emb):
    import pytest

    with pytest.raises(ValueError, match="dimension"):
        similarity.embedding_neardup_pairs_lsh(emb, dim=32)


def test_bucket_is_pure_function(emb, qvec):
    a = {r["vec_id"]: r["ann_bucket"] for r in similarity.with_ann_bucket(emb, 64).collect()}
    b = {r["vec_id"]: r["ann_bucket"] for r in similarity.with_ann_bucket(emb.repartition(5), 64).collect()}
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_ivf_fit_paths_identical(spark, sf_dir):
    """The Spark fit (fit_ivf) and the pyarrow fit the driver oracle
    uses must produce identical centroids."""
    import numpy as np

    import __spark_entry__ as entry

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = similarity.fit_ivf(emb, k=16)
    b = entry._ivf_centroids_for(sf_dir)
    assert np.array_equal(a, b)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF top-k with 4/16 probes must recover most of the exact top-k
    (the standard IVF recall bar on random data)."""
    import __spark_entry__ as entry

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = entry._query_vec(sf_dir)
    cent = similarity.fit_ivf(emb, k=16)
    celled = similarity.with_ivf_cell(emb, cent)
    approx = {r["vec_id"] for r in similarity.ann_topk_ivf(celled, q, cent, k=10, n_probes=4).collect()}
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    assert len(approx & exact) / len(exact) >= 0.5
    # full probe = exact (IVF with all cells probed degenerates to brute force)
    allp = {r["vec_id"] for r in similarity.ann_topk_ivf(celled, q, cent, k=10, n_probes=16).collect()}
    assert allp == exact


def test_ivf_cells_partition_all_rows(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = similarity.fit_ivf(emb, k=16)
    celled = similarity.with_ivf_cell(emb, cent)
    n = emb.count()
    stats = celled.groupBy("ivf_cell").count().collect()
    assert sum(r["count"] for r in stats) == n
    assert all(1 <= r["ivf_cell"] <= 16 for r in stats)


def test_ivf_probe_partition_pruning(spark, sf_dir, tmp_path):
    """The scale posture in with_ivf_cell's docstring, demonstrated: a
    cell-partitioned table + probe filter prunes the scan to the probed
    partitions (PartitionFilters on ivf_cell), so probe cost is
    O(n_probes / n_cells) of the data."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = similarity.fit_ivf(emb, k=16)
    path = str(tmp_path / "celled")
    similarity.with_ivf_cell(emb, cent).write.partitionBy("ivf_cell").parquet(path)
    celled = spark.read.parquet(path)
    q = [float(v) for v in emb.orderBy("vec_id").first()["embedding"]]
    probes = similarity.ivf_probe_cells(q, cent, n_probes=4)
    cand = celled.filter(F.col("ivf_cell").isin(probes))
    plan = cand._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan and "PartitionFilters" in scan[0] and "ivf_cell" in scan[0], scan
    # and the probe actually reads fewer rows than the table
    assert 0 < cand.count() < celled.count()


def test_embedding_lsh_hot_bucket_cap_bounds_candidates(spark):
    """A dense near-dup cluster lands in ONE bucket per band; with a cap
    below the cluster size no candidates are generated (caught upstream
    by exact dedup), while uncapped it is the k² blowup. Distinct
    far-apart vectors are unaffected."""
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.normal(size=16)
    cluster = [
        (i, (base + rng.normal(scale=1e-4, size=16)).astype("float32").tolist())
        for i in range(40)
    ]
    # orthogonal-ish singletons far from the cluster
    solo = [
        (100 + i, rng.normal(size=16).astype("float32").tolist()) for i in range(5)
    ]
    df = spark.createDataFrame(cluster + solo, "vec_id long, embedding array<float>")
    capped = similarity.embedding_neardup_pairs_lsh(
        df, threshold=0.99, dim=16, bits=4, n_bands=4, max_bucket=10
    )
    assert capped.count() == 0
    uncapped = similarity.embedding_neardup_pairs_lsh(
        df, threshold=0.99, dim=16, bits=4, n_bands=4, max_bucket=None
    )
    n = uncapped.filter((F.col("id_a") < 100) & (F.col("id_b") < 100)).count()
    assert n == 40 * 39 // 2


def test_band_key_sign_margin_over_fixtures():
    """Structural guard for band_keys_arrow's cross-engine sign parity
    (ADVICE r3): the numpy-matmul dot and the oracle's sequential dot
    may differ by float64 summation order (~1e-13 relative); a bucket
    bit flips only if some |dot| falls inside that band. Assert the
    minimum |dot| margin over EVERY (vector, plane) pair the registered
    queries actually evaluate — all fixture scales, both the bits=8
    ANN bucketing planes and the scaled-bits 8-band neardup planes —
    stays ≥ 1e-9, four orders above the discrepancy bound. New fixture
    data that violates this fails HERE, loudly, not as a spurious
    oracle hash mismatch."""
    import numpy as np
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
        mat = np.asarray(tbl.column("embedding").to_pylist(), dtype="float64")
        dim = mat.shape[1]
        plane_sets = [similarity.hyperplanes(dim, 8, similarity.ANN_SEED)]
        bits = entry._ann_bits(sf_dir)
        plane_sets += [
            similarity.hyperplanes(dim, bits, similarity.ANN_SEED + b)
            for b in range(8)
        ]
        planes = np.vstack(plane_sets)
        margin = np.abs(mat @ planes.T).min()
        assert margin >= 1e-9, f"{sf_dir}: sign margin {margin} too small"


def test_ivf_fit_bernoulli_sample_engages_and_is_layout_stable(spark, sf_dir):
    """With a sample override below n, the md5-Bernoulli fit path must
    (a) actually subsample, (b) give identical centroids on a
    reshuffled input, and (c) match a pure-Python selection of the
    same rule (the oracle mirror)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    target = 256
    a = similarity.fit_ivf(emb, k=4, sample=target)
    b = similarity.fit_ivf(emb.repartition(7), k=4, sample=target)
    assert np.array_equal(a, b)
    # python mirror of the selection
    rows = sorted(
        (r["vec_id"], r["embedding"]) for r in emb.collect()
        if similarity.ivf_sample_keep(n, target, r["vec_id"])
    )
    assert 0 < len(rows) < n  # genuinely subsampled
    # binomial concentration: within 4σ of the target rate
    sd = (n * (target / n) * (1 - target / n)) ** 0.5
    assert abs(len(rows) - target) < 4 * sd + 1
    c = similarity.ivf_centroids(
        np.array([v for _, v in rows], dtype="float64"), k=4
    )
    assert np.array_equal(a, c)
