"""IVF-PQ composition semantics on planted clustered data: cell routing
must send cluster-mates to the same cell, ADC ranking must recover the
true nearest neighbors when clusters are well separated, and the index
must be rerun-deterministic (resumable builds)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis3_spark.operators import similarity as S


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    """4 well-separated 64-dim clusters (orthogonal-ish block means, small
    in-cluster noise): every vector's true nearest neighbors are its
    cluster-mates by a wide cosine margin, so an IVF-PQ probe that routes
    or ranks wrongly is unambiguously caught."""
    rng = np.random.RandomState(11)
    centers = np.zeros((4, 64))
    for c in range(4):
        centers[c, c * 16 : (c + 1) * 16] = 1.0
    n_per = 50
    vecs, labels = [], []
    for c in range(4):
        pts = centers[c] + rng.standard_normal((n_per, 64)) * 0.05
        vecs.append(pts)
        labels += [c] * n_per
    V = np.concatenate(vecs).astype(np.float32)
    d = tmp_path_factory.mktemp("ivfpq")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(len(V)), pa.int64()),
            "embedding": pa.array([list(v) for v in V], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }),
        str(d / "embeddings.parquet"),
    )
    return str(d), np.array(labels)


def test_ivfpq_routes_clusters_to_shared_cells(spark, clustered_dir):
    d, labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    enc = S.ivfpq_encode(emb, C, books).collect()
    assert len(enc) == len(labels)
    # k-means may legitimately SPLIT a planted cluster across cells (8
    # centroids, 4 clusters), but with 0.05 noise vs orthogonal means a
    # cell must never MIX clusters — that's the invariant cell routing
    # rides on. Codes stay in range.
    by_cell: dict[int, set] = {}
    for r in enc:
        by_cell.setdefault(r["cell"], set()).add(int(labels[r["id"]]))
        assert 0 <= r["cell"] < 8
        assert all(0 <= c < 16 for c in r["codes"])
    for cell_labels in by_cell.values():
        assert len(cell_labels) == 1


def test_ivfpq_topk_matches_numpy_adc_reference_exactly(spark, clustered_dir):
    """The distributed probe path (cell routing -> broadcast probe join ->
    LUT gather -> rank) must reproduce a plain-numpy ADC reference
    EXACTLY, ranks and tie-breaks included — the compressed
    representation is the ground truth ADC answers to, so no geometry
    slack is allowed. Cluster-level recall rides on top: with orthogonal
    planted clusters, every returned neighbor is a cluster-mate.
    (In-cluster brute-force agreement is deliberately NOT asserted:
    cluster-mates are near-ties at cosine ~0.995+, below PQ resolution
    by design — Jégou et al. trade that precision for 32x compression.)"""
    from pyspark.sql import functions as F

    d, labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qids = [0, 50, 100, 150]
    qset = emb.where(F.col("vec_id").isin(qids))
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    enc_rows = {r["id"]: r for r in S.ivfpq_encode(emb, C, books).collect()}
    got = S.cosine_topk_ivfpq(
        emb, qset, k=5, nprobe=2, index=(C, books)
    ).collect()

    m, kcode, sub = books.shape
    qpdf = qset.select("vec_id", "embedding").orderBy("vec_id").toPandas()
    Q = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    QC = Qn @ C.T
    LUT = np.einsum("qsd,skd->qsk", Qn.reshape(len(Qn), m, sub), books)
    want = {}
    for i, qid in enumerate(qpdf["vec_id"]):
        probed = set(np.argsort(-QC[i])[:2])
        scored = []
        for nid, r in enc_rows.items():
            if nid == qid or r["cell"] not in probed:
                continue
            s = QC[i, r["cell"]] + sum(
                LUT[i, sx, r["codes"][sx]] for sx in range(m)
            )
            scored.append((-s, nid))
        for rank, (_, nid) in enumerate(sorted(scored)[:5], start=1):
            want[(qid, rank)] = nid

    got_map = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got}
    assert got_map == want
    assert all(labels[n] == labels[q] for (q, _), n in got_map.items())


def test_persisted_probe_matches_in_session_and_prunes_cell_files(
    spark, clustered_dir
):
    """The persisted cell-partitioned index is the same index: probing
    THROUGH the parquet round-trip must reproduce the in-session probe
    exactly. And it must be cheaper: the probe's static cell filter lands
    in the scan's PartitionFilters, so only the probed cells' partition
    directories are read — asserted via input_file_name on the pruned scan
    (every file read lives under a probed cell=<n>/ dir) and via the probe
    plan itself."""
    from pyspark.sql import functions as F

    from kinesis3_spark import tmpdirs

    d, labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    path = tmpdirs.mkdtemp(prefix="t_ivfpq_persist_") + "/index"
    S.persist_ivfpq_index(S.ivfpq_encode(emb, C, books), path)
    enc = S.read_ivfpq_index(spark, path)

    qset = emb.where(F.col("vec_id").isin([0, 50]))
    topk_p = S.cosine_topk_ivfpq(
        emb, qset, k=5, nprobe=2, index=(C, books), enc=enc
    )
    got_p = sorted(map(tuple, topk_p.collect()))
    got_m = sorted(
        map(
            tuple,
            S.cosine_topk_ivfpq(
                emb, qset, k=5, nprobe=2, index=(C, books)
            ).collect(),
        )
    )
    assert got_p == got_m and len(got_p) == 10

    # The probed-cell set, recomputed independently (top-2 cells per query).
    qpdf = qset.select("vec_id", "embedding").toPandas()
    Q = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probed = {int(c) for row in np.argsort(-(Qn @ C.T), axis=1)[:, :2] for c in row}
    all_cells = {r["cell"] for r in enc.select("cell").distinct().collect()}
    assert probed < all_cells  # pruning is meaningful: strictly fewer cells

    files = [
        r[0]
        for r in enc.where(F.col("cell").isin(sorted(probed)))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert files
    for f in files:
        assert any(f"cell={c}/" in f for c in probed), f
    plan = topk_p._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell#" in plan


def test_ivfpq_training_is_deterministic(spark, sf_dir):
    from kinesis3_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    C1, b1 = S.train_ivfpq(emb, n_centroids=8, m=8, k=16, iters=4)
    C2, b2 = S.train_ivfpq(emb, n_centroids=8, m=8, k=16, iters=4)
    assert np.array_equal(C1, C2) and np.array_equal(b1, b2)


def test_rerank_recovers_exact_topk_and_never_loses_to_adc(
    spark, clustered_dir
):
    """Retrieve-then-rerank on the planted clusters: with every cell
    probed and fetch_r covering the cluster, the exact re-rank must
    reproduce the brute-force top-k EXACTLY (quantization error fully
    cancelled — PQ codes only shortlist, raw cosine decides). And at any
    (nprobe, fetch_r) the re-ranked recall can never be below plain ADC
    at the same nprobe: it exact-scores a superset of what ADC ranked."""
    d, _labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    from pyspark.sql import functions as F

    qset = emb.where(F.col("vec_id") < 8)
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    enc = S.ivfpq_encode(emb, C, books)
    brute = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.cosine_topk_bruteforce(emb, qset, k=5).collect()
    }
    # full probe + generous over-fetch: exact equality with brute force
    rr_full = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.cosine_topk_ivfpq_rerank(
            emb, qset, k=5, fetch_r=60, nprobe=8, n_centroids=8,
            index=(C, books), enc=enc,
        ).collect()
    }
    assert rr_full == brute
    # tier ordering at a partial probe: rerank recall >= ADC recall
    truth_pairs = {(q, n) for q, n, _ in brute}
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk_ivfpq(
            emb, qset, k=5, nprobe=2, n_centroids=8,
            index=(C, books), enc=enc,
        ).collect()
    }
    rr_part = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk_ivfpq_rerank(
            emb, qset, k=5, fetch_r=30, nprobe=2, n_centroids=8,
            index=(C, books), enc=enc,
        ).collect()
    }
    assert len(rr_part & truth_pairs) >= len(adc & truth_pairs)


def test_index_meta_sidecar_enables_fresh_process_probe(
    spark, clustered_dir
):
    """VERDICT r9 'Next round' #2: the persisted index must be durable —
    a process that NEVER trained (no in-memory C/books, cleared query
    cache) probes the on-disk index from the path alone by reading the
    _INDEX_META.json sidecar, with results identical to the training
    session's probe. Also pins the JSON float round-trip: centroids and
    codebooks read back bit-identical, so ADC tables match exactly."""
    from pyspark.sql import functions as F

    from kinesis3_spark import tmpdirs

    d, labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    path = tmpdirs.mkdtemp(prefix="t_ivfpq_meta_") + "/index"
    S.persist_ivfpq_index(
        S.ivfpq_encode(emb, C, books), path, index=(C, books),
        params={"nprobe": 2},
    )
    # training-session probe (ground truth for parity)
    qset = emb.where(F.col("vec_id").isin([0, 50, 100]))
    want = sorted(map(tuple, S.cosine_topk_ivfpq(
        emb, qset, k=5, nprobe=2, index=(C, books),
        enc=S.read_ivfpq_index(spark, path),
    ).collect()))

    # "fresh process": drop every in-memory trace of training and the
    # query-layer cache, then reconstruct everything from the path
    from kinesis3_spark.queries.similarity import _IVFPQ_PERSISTED

    _IVFPQ_PERSISTED.clear()
    del C, books
    meta = S.read_ivfpq_index_meta(path)
    assert meta is not None
    C2, books2, params = meta
    assert params == {"nprobe": 2}
    got = sorted(map(tuple, S.cosine_topk_ivfpq(
        emb, qset, k=5, nprobe=int(params["nprobe"]), index=(C2, books2),
        enc=S.read_ivfpq_index(spark, path),
    ).collect()))
    assert got == want and len(got) == 15
    # bit-identical round-trip (json repr of finite doubles is exact)
    C3, books3 = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    assert np.array_equal(C2, C3) and np.array_equal(books2, books3)
    # a pre-sidecar index reports None instead of guessing
    bare = tmpdirs.mkdtemp(prefix="t_ivfpq_bare_") + "/index"
    S.persist_ivfpq_index(S.ivfpq_encode(emb, C3, books3), bare)
    assert S.read_ivfpq_index_meta(bare) is None


def test_rerank_post_filter_mines_hard_negatives_exactly(spark, clustered_dir):
    """pair_predicate/carry on the rerank tier (VERDICT r10 agenda #3):
    with full cell coverage (nprobe = n_centroids) and fetch_r covering
    the whole corpus, the post-filtered rerank must EQUAL the exact
    brute-force hard-negative truth — the composition degrades to exact
    when over-provisioned, so any mismatch is a wiring bug, not
    approximation. Every mined negative must carry a different label."""
    from pyspark.sql import functions as F

    d, labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    qset = emb.where(F.col("vec_id").isin([0, 50, 100]))
    pred = F.col("n_label") != F.col("q_label")
    ann = sorted(map(tuple, S.cosine_topk_ivfpq_rerank(
        emb, qset, k=5, fetch_r=200, nprobe=8, index=(C, books),
        pair_predicate=pred, carry=("label",),
    ).select("query_id", "rank", "neighbor_id").collect()))
    want = sorted(map(tuple, S.cosine_topk_bruteforce(
        emb, qset, k=5, pair_predicate=pred, carry=("label",),
    ).select("query_id", "rank", "neighbor_id").collect()))
    assert ann == want and len(ann) == 15
    for qid, _rank, nid in ann:
        assert labels[nid] != labels[qid]


def test_incremental_append_leaves_base_files_untouched(spark, tmp_path):
    """The scale claim of index maintenance: appending a batch writes ONLY
    the batch's new cell files — every pre-existing index file survives
    byte-identical (same path, size, mtime), so daily cost is O(batch)."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from kinesis3_spark.operators import similarity as S

    rng = np.random.RandomState(5)
    rows = [(i, rng.standard_normal(64).tolist()) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    base = emb.where(F.col("vec_id") < 100)
    batch = emb.where(F.col("vec_id") >= 100)
    C, books = S.train_ivfpq(base)
    path = str(tmp_path / "index")
    S.persist_ivfpq_index(S.ivfpq_encode(base, C, books), path, index=(C, books))

    def snapshot():
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot()
    C2, books2, _ = S.read_ivfpq_index_meta(path)
    S.ivfpq_encode(batch, C2, books2).write.partitionBy("cell").mode(
        "append"
    ).parquet(path)
    after = snapshot()
    missing = {p: v for p, v in before.items() if after.get(p) != v}
    # _SUCCESS (and its .crc) is legitimately rewritten by the second job;
    # data files are not
    missing = {
        p: v for p, v in missing.items() if "_SUCCESS" not in os.path.basename(p)
    }
    assert missing == {}, f"append disturbed base files: {sorted(missing)[:5]}"
    # and the appended rows are present in the read-back
    got = S.read_ivfpq_index(spark, path)
    assert got.count() == 120
    assert got.where(F.col("id") >= 100).count() == 20


def test_tombstoned_top1_is_replaced_by_next_live(spark, tmp_path):
    """Deleting a query's TRUE nearest neighbor must remove it from the
    served results and promote the next-best LIVE vector — proving the
    tombstone filter changes results rather than passing vacuously."""
    import numpy as np
    from pyspark.sql import functions as F

    from kinesis3_spark.operators import similarity as S

    rng = np.random.RandomState(9)
    anchor = rng.standard_normal(64)
    rows = [
        (0, anchor.tolist()),
        (1, (anchor + 0.01 * rng.standard_normal(64)).tolist()),  # true top-1
        (2, (anchor + 0.05 * rng.standard_normal(64)).tolist()),  # next best
    ]
    rows += [(10 + i, rng.standard_normal(64).tolist()) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    C, books = S.train_ivfpq(emb)
    enc = S.ivfpq_encode(emb, C, books)
    q = emb.where(F.col("vec_id") == 0)
    before = S.cosine_topk_ivfpq(emb, q, k=1, index=(C, books), enc=enc, nprobe=12)
    assert before.first().neighbor_id == 1
    tomb = spark.createDataFrame([(1,)], "id long")
    live = enc.join(F.broadcast(tomb), "id", "left_anti")
    after = S.cosine_topk_ivfpq(emb, q, k=1, index=(C, books), enc=live, nprobe=12)
    assert after.first().neighbor_id == 2


def test_knn_graph_edges_stay_within_planted_clusters(spark, clustered_dir):
    """knn_graph_ivfpq over the planted 4-cluster corpus: every vector's
    top-5 edges must point at cluster-mates (wide cosine margin), every
    vector gets exactly 5 edges, and the graph contains no self-loops —
    the distributed all-vectors build, not the driver-side query path."""
    d, labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    enc = S.ivfpq_encode(emb, C, books)
    edges = S.knn_graph_ivfpq(
        emb, (C, books), enc, k=5, nprobe=2, rerank_mult=4
    ).collect()
    assert len(edges) == len(labels) * 5
    per_q: dict[int, list] = {}
    for r in edges:
        assert r.query_id != r.neighbor_id
        assert labels[r.query_id] == labels[r.neighbor_id]
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_knn_graph_refine_matches_bruteforce_on_planted(spark, clustered_dir):
    """With enough probes to cover a cluster's cells AND a shortlist
    wider than the cluster (rerank_mult*k = 80 > 50 cluster-mates, whose
    ADC scores dominate every cross-cluster candidate by the planted
    margin), the exact-refine stage must reproduce the brute-force top-5
    exactly. A shortlist NARROWER than the cluster legitimately drops
    true neighbors (ADC noise reorders near-identical cluster-mates) —
    that regime is covered by the recall band, not exactness."""
    d, _labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    enc = S.ivfpq_encode(emb, C, books)
    got = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.knn_graph_ivfpq(
            emb, (C, books), enc, k=5, nprobe=4, rerank_mult=16
        ).collect()
    }
    want = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in S.cosine_topk_bruteforce(emb, emb, k=5).collect()
    }
    assert got == want


def test_shared_adc_scores_path_matches_per_leg_recompute(spark, clustered_dir):
    """OPTIMIZATION_r15: sim_cosine_topk_ivfpq_rerank computes ONE
    ivfpq_adc_scores relation and feeds it to both the rerank (k=fetch_r)
    and plain-ADC (k=k) legs. The shared-scores path must be row-identical
    to each leg recomputing its own probe — same candidates, same IEEE
    scores, same tie-breaks — for both consumers."""
    d, _labels = clustered_dir
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qset = emb.where("vec_id < 8")
    C, books = S.train_ivfpq(emb, n_centroids=8, m=8, k=16)
    enc = S.ivfpq_encode(emb, C, books)
    scores = S.ivfpq_adc_scores(emb, qset, nprobe=4, index=(C, books), enc=enc)

    def rows(df):
        return {(r.query_id, r.rank, r.neighbor_id) for r in df.collect()}

    adc_shared = S.cosine_topk_ivfpq(
        emb, qset, k=5, nprobe=4, index=(C, books), enc=enc, scores=scores
    )
    adc_own = S.cosine_topk_ivfpq(
        emb, qset, k=5, nprobe=4, index=(C, books), enc=enc
    )
    assert rows(adc_shared) == rows(adc_own)

    rr_shared = S.cosine_topk_ivfpq_rerank(
        emb, qset, k=5, fetch_r=16, nprobe=4, index=(C, books), enc=enc,
        scores=scores,
    )
    rr_own = S.cosine_topk_ivfpq_rerank(
        emb, qset, k=5, fetch_r=16, nprobe=4, index=(C, books), enc=enc
    )
    assert rows(rr_shared) == rows(rr_own)
