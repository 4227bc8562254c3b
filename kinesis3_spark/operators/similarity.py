"""Similarity search over embedding columns (SURVEY.md §2b "similarity
search"): exact cosine top-k (expression tier + Arrow-batched pandas tier)
and a random-hyperplane LSH scale path.

This is the `operators/similarity.py` module promised by
kinesis3_spark/functions/vectors.py — the two tiers share semantics:

  * Expression tier: `zip_with`+`aggregate` dot products, JVM-side — the
    oracle-parity path.
  * Pandas tier: `mapInPandas` numpy matmul per Arrow batch with PER-BATCH
    PARTIAL TOP-K — each executor emits at most k candidates per query per
    batch, so the shuffle carries O(batches * k * |Q|) rows instead of
    O(N * |Q|). This is the shape that survives 100 TB: the full N x Q score
    matrix never materializes or shuffles.

Top-k outputs are (query_id, rank, neighbor_id) with rank ties broken by
neighbor_id — no float column in the result, so cross-engine summation-order
noise cannot perturb a value hash.

The LSH path (random hyperplane signatures, multiple hash tables) is the
sub-linear candidate generator for genuinely-similar regimes (cos >~ 0.8).
On near-orthogonal corpora (like the synthetic test embeddings, max pairwise
cos ~0.5) exhaustive scoring is the *correct* choice — LSH recall collapses
by design below the similarity its tables are tuned for; tests plant
high-similarity fixtures to exercise it honestly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity

LSH_SEED = 42
LSH_TABLES = 4
LSH_BITS = 8  # bits per table


def _topk_from_scores(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("bigint").alias("rank"), "neighbor_id")
    )


def cosine_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_predicate=None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Exact top-k neighbors per query vector, expression tier.

    The (small) query set is broadcast against the full embedding table, so
    scoring is map-side over the scan; only the scored candidates shuffle
    for the per-query rank. Exhaustive over N — the baseline every ANN
    variant is measured against.

    ``pair_predicate`` generalizes WHICH pairs are scored (default: every
    non-self pair). ``carry`` columns ride both sides as ``q_<c>`` /
    ``n_<c>`` so the predicate can correlate query and corpus metadata —
    e.g. hard-negative mining scores only label-mismatched pairs
    (``F.col("n_label") != F.col("q_label")``). One definition for every
    exact-scoring variant, so tie-break and cast discipline cannot drift
    between them (review r10-3rd #5)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        *[F.col(c).alias(f"q_{c}") for c in carry],
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        *[F.col(c).alias(f"n_{c}") for c in carry],
    )
    pred = (
        pair_predicate
        if pair_predicate is not None
        else F.col("neighbor_id") != F.col("query_id")
    )
    scored = (
        e.join(F.broadcast(q), pred)
        .withColumn("cos", cosine_similarity("qv", "nv"))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_scores(scored, k)


def cosine_topk_pandas(
    emb: DataFrame,
    queries_pdf: pd.DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors, Arrow/pandas tier with per-batch partial top-k.

    `queries_pdf` is a driver-side pandas frame (the query set is bounded by
    definition — it plays the broadcast role). Each mapInPandas batch scores
    batch x Q with one numpy matmul and emits only its local top-k per
    query; the final global rank merges batch winners.
    """
    qids = queries_pdf[id_col].to_numpy()
    Q = np.stack(queries_pdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Mn @ Qn.T  # (batch, |Q|)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(qids):
                mask = ids != qid
                sj, nj = S[mask, j], ids[mask]
                # local top-k, ties broken by neighbor id ascending
                order = np.lexsort((nj, -sj))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(nj[order])
                out_c.extend(sj[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    cand = emb.select(id_col, vec_col).mapInPandas(
        score_batches, schema="query_id long, neighbor_id long, cos double"
    )
    return _topk_from_scores(cand, k)


# --------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)
# --------------------------------------------------------------------------

def _planes(dim: int, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((LSH_TABLES * LSH_BITS, dim))


def lsh_signatures(
    emb: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, table, sig): one `LSH_BITS`-bit sign-pattern signature per hash
    table, computed batch-at-a-time with a single numpy matmul."""
    P = _planes(dim)

    def sign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (M @ P.T) > 0  # (n, tables*bits)
            weights = 1 << np.arange(LSH_BITS)
            rows = {"id": np.repeat(ids, LSH_TABLES)}
            sigs = np.empty((len(ids), LSH_TABLES), dtype=np.int64)
            for t in range(LSH_TABLES):
                sigs[:, t] = bits[:, t * LSH_BITS : (t + 1) * LSH_BITS] @ weights
            rows["table"] = np.tile(np.arange(LSH_TABLES), len(ids))
            rows["sig"] = sigs.reshape(-1)
            yield pd.DataFrame(rows)

    return emb.select(id_col, vec_col).mapInPandas(
        sign_batches, schema="id long, table int, sig long"
    )


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates = vectors sharing any table signature with the
    query (equi-join on (table, sig) — sub-linear, never all-pairs), then
    exact cosine + rank over candidates only.

    Recall depends on the similarity regime: ~(1 - (1 - p^BITS)^TABLES) per
    neighbor with p = 1 - theta/pi. Tuned for cos >= ~0.8 neighborhoods."""
    sig_e = lsh_signatures(emb, dim, id_col, vec_col)
    sig_q = lsh_signatures(queries, dim, id_col, vec_col).withColumnRenamed(
        "id", "query_id"
    )
    cand_ids = (
        sig_q.join(sig_e, ["table", "sig"])
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    e = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand_ids.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("cos", cosine_similarity("qv", "nv"))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_scores(scored, k)


# --------------------------------------------------------------------------
# IVF (inverted-file) index — the k-means-cell ANN scale path
# --------------------------------------------------------------------------

def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means centroids trained on a bounded driver-side sample
    (standard IVF practice — the index trains on a sample, assigns the full
    corpus distributed). Deterministic: fixed seed, fixed iteration count.
    Returns L2-normalized (n_centroids, dim)."""
    # orderBy before limit: a bare limit takes arbitrary rows, which would
    # make the trained centroids (and thus cell assignment) run-dependent.
    # Bounded sort — at full scale use TABLESAMPLE with a seed instead.
    pdf = emb.select(id_col, vec_col).orderBy(id_col).limit(sample).toPandas()
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    C = Xn[rng.choice(len(Xn), size=min(n_centroids, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(len(C)):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / np.linalg.norm(c)
    return C


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_vec: bool = False,
    n_assign: int = 1,
) -> DataFrame:
    """(id, cell): nearest-centroid assignment, one numpy matmul per Arrow
    batch. At scale the output is what you PARTITION/cluster the stored
    table by, so a probe reads only its cells' files. ``with_vec=True``
    additionally carries the vector through (column ``v``) so consumers
    that need (cell, vector) — the SemDeDup within-cell join — get both
    from ONE scan instead of re-joining the assignment back to the
    corpus. ``n_assign=m`` SOFT-assigns each vector to its m nearest
    cells (one output row per (vector, cell)) — multi-probe coverage
    for boundary-straddling neighbors; clamped to the number of
    centroids, so a tiny corpus (fewer trained centroids than m) never
    under-fills the output arrays."""

    def assign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ centroids.T
            m = min(n_assign, sims.shape[1])
            if m <= 1:
                out = {
                    "id": pdf[id_col].to_numpy(),
                    "cell": np.argmax(sims, axis=1).astype(np.int32),
                }
                if with_vec:
                    out["v"] = pdf[vec_col]
            else:
                near = np.argsort(-sims, axis=1)[:, :m]
                out = {
                    "id": np.repeat(pdf[id_col].to_numpy(), m),
                    "cell": near.reshape(-1).astype(np.int32),
                }
                if with_vec:
                    out["v"] = (
                        pdf[vec_col].repeat(m).reset_index(drop=True)
                    )
            yield pd.DataFrame(out)

    vec_t = [f.dataType.simpleString() for f in emb.schema.fields
             if f.name == vec_col][0]
    schema = "id long, cell int" + (f", v {vec_t}" if with_vec else "")
    return emb.select(id_col, vec_col).mapInPandas(assign_batches, schema)


def semdedup_pairs(
    emb: DataFrame,
    threshold: float,
    n_centroids: int | None = None,
    n_assign: int = 1,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell: int = 256,
    n_rows: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embedding near-dup
    pairs found WITHIN k-means cells only. The all-pairs formulation
    (embedding_neardup_pairs) is O(N²) and exists for oracle truth; this
    is the shape that runs at 100 TB — cluster once, then compare only
    within each cell, cost Σ|cell|² ≈ N²/k for balanced cells and
    embarrassingly parallel per cell. Near-duplicates have near-equal
    embeddings, so they land in the same cell with high probability —
    the recall the registered query audits against exact truth.

    ``n_assign`` soft-assigns each vector to its m nearest cells
    (multi-probe): a pair straddling a cell boundary is still caught
    when ANY cell is shared, at m² the comparison volume — the recall/
    cost dial for thresholds well below true-duplicate similarity
    (boundary-straddling is rare for genuine dups, common for weakly
    similar pairs).

    Plan: one assignment scan (m cells + vector per row, from one
    mapInPandas pass), self-joined on the cell key — both sides shuffle
    by cell, pairs never cross cells, the i<j predicate keeps each pair
    once per shared cell and a final distinct collapses multi-cell
    rediscoveries. Returns distinct (id_a, id_b).

    CELL-COUNT DERIVATION (VERDICT r9 'Next round' #5): the m²N²/k cost
    claim only holds when k SCALES WITH N — a fixed k=16 makes the
    within-cell join quadratic again as the corpus grows. When
    ``n_centroids`` is not given, it derives as
    ``max(16, ceil(N / target_cell))``: bounded ~target_cell-row cells,
    so within-cell work is O(N * m² * target_cell) — LINEAR in corpus
    size, the paper's operating point (Abbas et al. use 11k clusters
    for LAION's 233M embeddings ≈ 21k per cell). N comes from ``n_rows``
    when the caller already knows it, else one count() over the
    embedding scan (column-pruned metadata pass — cheap next to the
    assignment scan). The training sample widens with k (≥8 vectors per
    centroid) so derived cells are actually trainable; at corpora where
    that sample outgrows the driver, swap the bounded-sort sample for
    distributed k-means — the derivation logic is unchanged."""
    if centroids is None and n_centroids is None:
        n = n_rows if n_rows is not None else emb.count()
        n_centroids = max(16, -(-int(n) // target_cell))
    C = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            emb, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
            sample=max(4096, 8 * n_centroids),
        )
    )
    tagged = ivf_assign(
        emb, C, id_col, vec_col, with_vec=True, n_assign=n_assign
    )
    a = tagged.select(
        "cell", F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = tagged.select(
        "cell", F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    # shuffle_hash: a large×large equi-join on a 16-value key is exactly
    # the shape AQE over-broadcasts in local mode (measured 3.5x slower
    # for the triangle census; a vector-carrying broadcast is worse) —
    # and the hint is also the 100 TB-correct strategy: nothing to
    # outgrow. The two `tagged` references re-execute the assignment
    # map per side (Spark re-plans non-materialized subtrees); at scale
    # the assignment is PERSISTED clustered by cell (the docstring's
    # production lifecycle) and this join reads it twice from disk.
    return (
        a.join(b.hint("shuffle_hash"), "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("va", "vb"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b")
        .distinct()
    )


def cosine_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k: probe the `nprobe` nearest cells per query; exact
    cosine + rank over cell members only — candidate volume ~ nprobe/
    n_centroids of the corpus instead of all of it.

    `centroids` lets a caller that also needs the cell assignment (e.g. the
    banded integrity query) train once and share the index — retraining is
    deterministic but costs an extra bounded-sample job."""
    C = (
        centroids
        if centroids is not None
        else train_ivf_centroids(emb, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col)
    )
    cells = ivf_assign(emb, C, id_col, vec_col)
    qpdf = queries.select(id_col, vec_col).toPandas()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probes = [
        (int(qid), int(cell))
        for qid, row in zip(qpdf[id_col], np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe])
        for cell in row
    ]
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, cell int")
    cand_ids = (
        cells.join(F.broadcast(probe_df), "cell")
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    e = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    scored = (
        cand_ids.join(F.broadcast(q), "query_id")
        .join(e, "neighbor_id")
        .withColumn("cos", cosine_similarity("qv", "nv"))
        .select("query_id", "neighbor_id", "cos")
    )
    return _topk_from_scores(scored, k)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — the embedding
    analogue of near-dup text detection.

    Exhaustive formulation for oracle checking; the production path at scale
    is the same verify step fed by `lsh_signatures` candidates (pairs sharing
    a table signature), which is how FAISS-style dedup pipelines block."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_similarity("va", "vb"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


# ----------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011 — "Product Quantization
# for Nearest Neighbor Search", public). The standard large-scale ANN
# compression: split the vector into M subspaces, k-means each subspace to
# a K-codeword codebook, store M uint8 codes per vector (64-dim float32 →
# 8 bytes at M=8, a 32x reduction). Distances are then computed against
# codebook lookup tables without touching raw vectors.
# ----------------------------------------------------------------------

def fetch_pq_sample(
    emb: DataFrame,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """The bounded DETERMINISTIC training sample (orderBy before limit —
    the same contract as train_ivf_centroids; at full scale, seeded
    TABLESAMPLE). Fetch ONCE and share across codebook trainings — each
    fetch is a full scan+sort+collect job."""
    pdf = emb.select(id_col, vec_col).orderBy(id_col).limit(sample).toPandas()
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 64,
    iters: int = 8,
    sample: int = 4096,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    X: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace Lloyd k-means codebooks over the bounded sample
    (pass a prefetched `X` from fetch_pq_sample to train several
    codebooks — e.g. the K=1 baseline — without re-collecting).
    Returns (m, k, dim/m) float64. Empty clusters keep their previous
    centroid (standard Lloyd degeneracy handling, deterministic)."""
    if X is None:
        X = fetch_pq_sample(emb, sample=sample, id_col=id_col, vec_col=vec_col)
    n, dim = X.shape
    assert dim % m == 0, (dim, m)
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, min(k, n), sub))
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        C = Xs[rng.choice(n, size=min(k, n), replace=False)]
        for _ in range(iters):
            # OPTIMIZATION_r15: einsum over the difference tensor instead
            # of materializing the squared (n, k, sub) temp then reducing
            # — one fused pass, ~30% faster driver-side training.
            # Verified BIT-IDENTICAL books (raw and residual paths) on the
            # actual deterministic samples at sf0.001/0.01/0.1 (both
            # reduce the 16-element sub axis in one sequential block), so
            # every downstream code/topk result is unchanged.
            D = Xs[:, None, :] - C[None, :, :]
            d2 = np.einsum("ijk,ijk->ij", D, D)
            assign = d2.argmin(axis=1)
            for j in range(len(C)):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = C
    return books


def train_ivfpq(
    emb: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 64,
    iters: int = 8,
    sample: int = 4096,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    X: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """IVF-PQ index training (the FAISS `IVFx,PQy` default composition,
    Jégou et al. 2011 §IV): coarse spherical-k-means centroids for cell
    routing, then product-quantization codebooks trained on the
    RESIDUALS (x_normalized - centroid[cell]) of the SAME bounded sample
    — residuals concentrate near zero, so a fixed code budget quantizes
    them far more finely than raw vectors. Codebooks are SHARED across
    cells (standard: per-cell books would be n_centroids x the memory).
    One sample fetch feeds both trainings. Returns (C, books):
    (n_centroids, dim) L2-normalized and (m, k, dim/m)."""
    if X is None:
        X = fetch_pq_sample(emb, sample=sample, id_col=id_col, vec_col=vec_col)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    C = Xn[rng.choice(len(Xn), size=min(n_centroids, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(len(C)):
            members = Xn[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / np.linalg.norm(c)
    residuals = Xn - C[np.argmax(Xn @ C.T, axis=1)]
    books = train_pq_codebooks(
        emb, m=m, k=k, iters=iters, seed=seed, id_col=id_col, vec_col=vec_col,
        X=residuals,
    )
    return C, books


def ivfpq_encode(
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, codes[m]): the compressed IVF-PQ index rows — cell
    assignment plus residual PQ codes, one vectorized pass per Arrow
    batch. This is the PERSISTED representation at 100 TB: ~1 + m bytes
    of index per vector instead of 4*dim, written once, clustered by
    cell so a probe reads only its cells' files. Zero shuffle: the
    (C, books) arrays (~40 KB) ship in the closure."""
    m, k, sub = codebooks.shape

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            cell = np.argmax(Mn @ centroids.T, axis=1)
            R = Mn - centroids[cell]
            codes = np.empty((len(M), m), np.int32)
            for s in range(m):
                Rs = R[:, s * sub : (s + 1) * sub]
                # Same einsum fusion as pq_encode (OPTIMIZATION_r15) —
                # argmin verified exact-equal on the real residuals with
                # the trained books at all test SFs (see pq_encode note).
                D = Rs[:, None, :] - codebooks[s][None, :, :]
                d2 = np.einsum("ijk,ijk->ij", D, D)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cell": cell.astype(np.int32),
                    "codes": list(codes),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        encode_batches, schema="id long, cell int, codes array<int>"
    )


def ivfpq_adc_scores(
    emb: DataFrame,
    queries: DataFrame,
    nprobe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[np.ndarray, np.ndarray] | None = None,
    enc: DataFrame | None = None,
) -> DataFrame:
    """The ADC-scored candidate relation `(query_id, neighbor_id, cos)`
    underlying `cosine_topk_ivfpq` — exposed so a caller that needs the
    SAME probe at several k values (e.g. the retrieve-then-rerank audit,
    which ranks the identical candidates at k=fetch_r and at k=k) can
    compute the cell-pruned scan + Arrow ADC pass ONCE, persist it, and
    pay only the bounded top-k windows per consumer (guide §2.3: Spark
    re-plans a non-materialized subtree under every alias — the r14
    alias-subtree lesson)."""
    C, books = index if index is not None else train_ivfpq(
        emb, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    if enc is None:
        enc = ivfpq_encode(emb, C, books, id_col, vec_col)
    m, kcode, sub = books.shape

    qpdf = queries.select(id_col, vec_col).toPandas()
    qids = qpdf[id_col].to_numpy()
    Q = np.stack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    QC = Qn @ C.T  # (|Q|, n_centroids)
    # LUT[i, s, j] = q_i's subvector s dot codeword j of book s
    LUT = np.einsum(
        "qsd,skd->qsk", Qn.reshape(len(Qn), m, sub), books
    )
    qpos = {int(q): i for i, q in enumerate(qids)}
    probes = [
        (int(qid), int(cell))
        for qid, row in zip(qids, np.argsort(-QC, axis=1)[:, :nprobe])
        for cell in row
    ]
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, cell int")
    # Static cell pruning BEFORE the probe join: the union of probed cells
    # is known driver-side (bounded: |Q| * nprobe ints), and an explicit
    # isin filter reaches the scan as a PartitionFilter when `enc` is the
    # cell-partitioned persisted index — a broadcast join alone would not
    # prune files here (DPP degrades to a no-op in this Spark build; see
    # operators/pruning.py). On an in-session enc it is a cheap row filter.
    needed_cells = sorted({c for _, c in probes})
    cand = (
        enc.where(F.col("cell").isin(needed_cells))
        .join(F.broadcast(probe_df), "cell")
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "cell", "codes")
    )

    def adc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        srange = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qi = np.array([qpos[q] for q in pdf["query_id"]])
            cells = pdf["cell"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            score = QC[qi, cells] + LUT[qi[:, None], srange[None, :], codes].sum(
                axis=1
            )
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cos": score,
                }
            )

    return cand.mapInPandas(
        adc_batches, schema="query_id long, neighbor_id long, cos double"
    )


def cosine_topk_ivfpq(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[np.ndarray, np.ndarray] | None = None,
    enc: DataFrame | None = None,
    scores: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN top-k via asymmetric distance computation (ADC): probe
    the `nprobe` nearest cells per query and rank candidates WITHOUT ever
    touching raw corpus vectors — approx_cos(q, x) = q·C[cell] +
    Σ_s LUT_q[s][code_s], where LUT_q[s][j] = q_sub_s · books[s][j].
    Because codebooks are shared across cells, each query's (m, k) lookup
    table is built ONCE driver-side (queries are bounded) and shipped in
    the mapInPandas closure with the (|Q|, n_centroids) query-centroid dot
    matrix; scoring a candidate is m table lookups + adds over the 1+m
    byte index row. This is the full production ANN shape: compressed
    index scan, cell-pruned candidates, no raw-vector I/O on the probe
    path. Pass `index`/`enc` to reuse a trained index and its encoded
    corpus across queries; pass `scores` (from `ivfpq_adc_scores`) to
    reuse an already-computed ADC pass and pay only the top-k window."""
    if scores is None:
        scores = ivfpq_adc_scores(
            emb, queries, nprobe=nprobe, n_centroids=n_centroids,
            id_col=id_col, vec_col=vec_col, index=index, enc=enc,
        )
    return _topk_from_scores(scores, k)


def cosine_topk_ivfpq_rerank(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    fetch_r: int = 64,
    nprobe: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[np.ndarray, np.ndarray] | None = None,
    enc: DataFrame | None = None,
    pair_predicate=None,
    carry: tuple[str, ...] = (),
    scores: DataFrame | None = None,
) -> DataFrame:
    """Two-stage retrieve-then-rerank — the standard production recall
    lift over a compressed index (FAISS's refine/`k_factor`, Milvus's
    reorder): stage 1 over-fetches the top ``fetch_r`` (>> k) candidates
    per query from the IVF-PQ index by ADC score (compressed rows only,
    raw vectors untouched); stage 2 exact-scores ONLY those |Q| x
    fetch_r survivors with raw vectors and returns the exact-cosine
    top-k. Re-ranking cancels the PQ quantization error entirely — any
    true neighbor the probed cells contain is recovered as long as ADC
    ranks it inside fetch_r. What it cannot recover is a neighbor in an
    UNPROBED cell, so the production pairing is over-probe + re-rank:
    nprobe buys cell coverage, fetch_r buys quantization forgiveness,
    and exact scoring is paid on a candidate set that is O(|Q| *
    fetch_r), not O(N).

    Scale: stage 1 is the plain probe (cell-pruned index files, ADC in
    Arrow batches). The candidate id set is bounded driver metadata in
    spirit but never collected — it stays a DataFrame and BROADCASTS
    into an equi-join against the corpus by id, so the raw-vector fetch
    is one map-side hash join over the corpus scan (at real scale the
    corpus is bucketed by id and this join is the point-lookup tier).
    Exact scoring is a JVM-side expression over |Q| x fetch_r rows.

    ``pair_predicate``/``carry`` (same ``q_<c>``/``n_<c>`` contract as
    cosine_topk_bruteforce) POST-FILTER the over-fetched candidates
    between the ADC stage and the exact re-rank — the post-filter ANN
    strategy (FAISS/Milvus filtered search over a compressed index):
    fetch_r must over-provision for the predicate's miss rate, which is
    why it composes with over-probe. Hard-negative mining at scale is
    exactly this with ``n_label != q_label``."""
    cand = cosine_topk_ivfpq(
        emb, queries, k=fetch_r, nprobe=nprobe, n_centroids=n_centroids,
        id_col=id_col, vec_col=vec_col, index=index, enc=enc, scores=scores,
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        *[F.col(c).alias(f"q_{c}") for c in carry],
    )
    e = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"),
        *[F.col(c).alias(f"n_{c}") for c in carry],
    )
    scored = (
        e.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    if pair_predicate is not None:
        scored = scored.where(pair_predicate)
    scored = scored.withColumn(
        "cos", cosine_similarity("qv", "nv")
    ).select("query_id", "neighbor_id", "cos")
    return _topk_from_scores(scored, k)


def persist_ivfpq_index(
    enc: DataFrame,
    path: str,
    index: tuple[np.ndarray, np.ndarray] | None = None,
    params: dict | None = None,
) -> None:
    """Write the encoded IVF-PQ corpus CLUSTERED BY CELL: one parquet
    partition directory per cell (`cell=<n>/part-*.parquet`), the on-disk
    layout the probe path's partition pruning rides on. This is the step
    from "IVF-PQ built in one session" to "100 TB ANN index on disk":
    encode once, persist once, and every subsequent probe reads only its
    nprobe cells' files — index I/O per probe is nprobe/n_centroids of
    the index, not all of it. At real scale the same write lands on the
    object store and the cell directories are the retrieval unit.

    ``index=(C, books)`` additionally writes the trained centroids and
    codebooks (plus optional probe ``params``) as a ``_INDEX_META.json``
    sidecar INSIDE the index directory — the piece that makes the index
    durable: encoded rows are meaningless without the codebooks that
    decode them, and without the sidecar a fresh process would have to
    RETRAIN to probe (VERDICT r9 'Next round' #2 — FAISS serializes the
    quantizers into the index file for the same reason). The sidecar is
    driver metadata (~100 KB at 16x64 float64: n_centroids*dim +
    m*k*dim/m doubles), written AFTER the data files so a reader that
    sees the sidecar sees a complete index."""
    enc.write.partitionBy("cell").mode("overwrite").parquet(path)
    if index is not None:
        import json as _json
        import os as _os

        C, books = index
        meta = {
            "centroids": C.tolist(),
            "codebooks": books.tolist(),
            "params": dict(params or {}),
        }
        tmp = _os.path.join(path, "_INDEX_META.json.tmp")
        with open(tmp, "w") as f:
            _json.dump(meta, f)
        _os.replace(tmp, _os.path.join(path, "_INDEX_META.json"))


def read_ivfpq_index_meta(
    path: str,
) -> tuple[np.ndarray, np.ndarray, dict] | None:
    """Read the ``_INDEX_META.json`` sidecar back as (C, books, params),
    or None for a pre-sidecar index (caller decides whether to retrain).
    Round-trip is exact: float64 -> JSON repr -> float64 is value-
    preserving for finite doubles (Python json emits repr(float), which
    reads back bit-identical), so a fresh process probes the on-disk
    index with bit-identical ADC tables — pinned by parity in
    tests/test_ivfpq.py."""
    import json as _json
    import os as _os

    p = _os.path.join(path, "_INDEX_META.json")
    if not _os.path.exists(p):
        return None
    with open(p) as f:
        meta = _json.load(f)
    return (
        np.asarray(meta["centroids"], dtype=np.float64),
        np.asarray(meta["codebooks"], dtype=np.float64),
        meta.get("params", {}),
    )


def read_ivfpq_index(spark, path: str) -> DataFrame:
    """Read a persisted cell-partitioned index back in the (id, cell,
    codes) shape `cosine_topk_ivfpq` consumes. `cell` comes back as a
    partition column (directory-inferred int); selecting it by name keeps
    consumers layout-agnostic. Filters on `cell` prune at the partition
    level — asserted in tests/test_ivfpq.py. Parquet discovery ignores
    the underscore-prefixed `_INDEX_META.json` sidecar by convention."""
    df = spark.read.parquet(path)
    return df.select("id", F.col("cell").cast("int").alias("cell"), "codes")


def knn_graph_ivfpq(
    emb: DataFrame,
    index: tuple[np.ndarray, np.ndarray],
    enc: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rerank_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """OFFLINE kNN-graph construction over an IVF-PQ index: every corpus
    vector is a query; returns the (query_id, rank, neighbor_id) edge
    table a graph tier consumes (link prediction, components, semantic
    clustering). VERDICT r13 agenda #4 (carried from r12 #8).

    This is NOT cosine_topk_ivfpq with qset=corpus: that operator
    collects the query set driver-side to build per-query LUTs (correct
    for bounded serving batches, impossible for |corpus| queries). The
    all-vectors shape is fully distributed:

      1. DECODE once: each encoded row reconstructs its approximate
         vector C[cell] + concat(books[s][code_s]) in one mapInPandas
         pass — the codebooks are driver constants in the closure
         (~100 KB), raw corpus vectors are never read on this side.
      2. PROBE-ASSIGN queries: one mapInPandas pass over the corpus
         emits (query_id, probed cell, normalized vector) x nprobe —
         np.argsort(kind="stable") so cell routing is deterministic.
      3. ONE equi-join on `cell` co-shuffles queries and decoded
         candidates (the only shuffle of the build); scoring is the
         JVM-side zip_with/aggregate dot product — ADC semantics
         (qn · decoded), matching cosine_topk_ivfpq's ranking.
      4. Per-query top-k window (rank ties broken by neighbor_id).

    Scale: per-cell work is |Q_cell| x |X_cell| — the IVF balance knob;
    with n_centroids ~ sqrt(N) (train_ivfpq's derivation) each cell's
    candidate block stays ~N, total ~N·nprobe·N/n_centroids ≈ the
    textbook IVF build cost. Skewed cells are AQE skew-join territory;
    the decoded side is (dim+2) doubles/row — 2000x smaller than
    payloads, safe to shuffle."""
    C, books = index
    m, _kcode, sub = books.shape

    def dec_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        srange = np.arange(m)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = pdf["cell"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            dvec = C[cells] + books[srange[None, :], codes].reshape(
                len(pdf), m * sub
            )
            yield pd.DataFrame(
                {
                    "cell": cells,
                    "neighbor_id": pdf["id"].to_numpy(),
                    "dvec": list(dvec),
                }
            )

    dec = enc.mapInPandas(
        dec_batches, schema="cell int, neighbor_id long, dvec array<double>"
    )

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            Q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(Q, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            Qn = Q / norms
            top = np.argsort(-(Qn @ C.T), axis=1, kind="stable")[:, :nprobe]
            reps = np.repeat(np.arange(len(ids)), nprobe)
            yield pd.DataFrame(
                {
                    "query_id": ids[reps],
                    "cell": top.ravel().astype("int32"),
                    "qn": list(Qn[reps]),
                }
            )

    probes = emb.select(id_col, vec_col).mapInPandas(
        probe_batches, schema="query_id long, cell int, qn array<double>"
    )
    scored = (
        probes.join(dec, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("qn", "dvec", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("cos"),
        )
    )
    if rerank_mult <= 0:
        return _topk_from_scores(scored, k)
    # exact REFINE (FAISS's IVFPQ,Refine shape): keep the ADC top
    # rerank_mult*k shortlist per query, fetch ONLY those raw vectors
    # (bounded raw I/O: R rows per query, never the probed cells), and
    # re-rank by exact cosine — PQ routes and prunes, floats decide.
    shortlist = _topk_from_scores(scored, rerank_mult * k).select(
        "query_id", "neighbor_id"
    )
    qv = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    nv = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    exact = (
        shortlist.join(nv, "neighbor_id")
        .join(qv, "query_id")
        .select("query_id", "neighbor_id", cosine_similarity("qv", "nv").alias("cos"))
    )
    return _topk_from_scores(exact, k)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    baseline: np.ndarray | None = None,
) -> DataFrame:
    """(id, codes[m], err_micro): nearest-codeword assignment per subspace
    — one vectorized distance computation per Arrow batch per subspace
    (the corpus-side pass is distributed; only the (m, k, sub) codebook
    array ships to executors in the closure, ~32 KB at 8x64x8). err_micro
    is the per-vector squared reconstruction error in 1e-6 units —
    integer-quantized WITHIN the vector before any cross-row aggregation
    (float-parity discipline).

    `baseline` (OPTIMIZATION_r14, guide §4.1): a second (m', k', sub')
    codebook array scored in the SAME Arrow pass, adding a
    `base_err_micro` column with identical per-vector arithmetic — the
    reconstruction-band query previously ran a whole second
    decode+encode corpus pass just for the k=1 baseline error sum."""
    m, k, sub = codebooks.shape

    def _err_codes(X: np.ndarray, books: np.ndarray):
        bm, bk, bsub = books.shape
        codes = np.empty((len(X), bm), np.int32)
        err = np.zeros(len(X))
        for s in range(bm):
            Xs = X[:, s * bsub : (s + 1) * bsub]
            # OPTIMIZATION_r15: einsum over the difference tensor — the
            # same fusion as train_pq_codebooks (one pass, no squared
            # (n, k, sub) temp). d2 can differ from the sum() form in the
            # last ulp (numpy's unrolled pairwise reduce vs einsum's
            # sequential), but the OUTPUTS are row-local and were verified
            # exact-equal (codes AND err_micro) on the real corpus with
            # the actually-trained books at sf0.001/0.01/0.1; per-row
            # values are batching-independent, so the check transfers to
            # any Arrow batch split.
            D = Xs[:, None, :] - books[s][None, :, :]
            d2 = np.einsum("ijk,ijk->ij", D, D)
            codes[:, s] = d2.argmin(axis=1)
            err += d2[np.arange(len(X)), codes[:, s]]
        return codes, np.floor(err * 1e6).astype(np.int64)

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes, err = _err_codes(X, codebooks)
            out = {
                "id": pdf[id_col].to_numpy(),
                "codes": list(codes),
                "err_micro": err,
            }
            if baseline is not None:
                out["base_err_micro"] = _err_codes(X, baseline)[1]
            yield pd.DataFrame(out)

    schema = "id long, codes array<int>, err_micro long"
    if baseline is not None:
        schema += ", base_err_micro long"
    return emb.select(id_col, vec_col).mapInPandas(encode_batches, schema=schema)


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (Achlioptas 2003 sign matrix).
# --------------------------------------------------------------------------

def jl_sign(k: int, j: int, salt: str = "rp") -> float:
    """Deterministic +-1 projection-matrix entry R[k][j] from md5 parity —
    engine-portable model config (any SQL engine, and any future run,
    rebuilds the identical matrix; no RNG state to ship)."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"{salt}:{k}:{j}".encode()).hexdigest(), 16) & 1 else -1.0


def jl_signs(out_dim: int, in_dim: int, salt: str = "rp") -> list[list[float]]:
    return [[jl_sign(k, j, salt) for j in range(in_dim)] for k in range(out_dim)]


def random_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    salt: str = "rp",
) -> DataFrame:
    """Append an `out_dim`-element array<double> column:
    proj[k] = (1/sqrt(out_dim)) * sum_j v[j] * R[k][j], R the +-1
    Achlioptas sign matrix (sparse-JL variant with density 1: E preserves
    inner products, JL distortion ~ sqrt(2/out_dim)).

    Scale: a pure per-row fold — O(in_dim * out_dim) multiply-adds in the
    scan stage, no shuffle, no Python. The sign matrix is ONE array
    literal and the fold is transform/zip_with/aggregate, so the Catalyst
    tree stays ~matrix-size-independent (an unrolled element_at chain
    measured ~12 s of analyzer time at 64x16 — the loop form plans in
    milliseconds). Use out_dim a power of four so the 1/sqrt scale is an
    exact double (16 -> 0.25).

    Cross-engine parity: `aggregate` folds left-to-right from an exact
    0.0 seed over exact float->double casts, so any engine evaluating the
    same left-associated '+' chain reproduces each double bit-for-bit
    (0.0 + t1 == t1 for every finite t1 except -0.0, which a nonzero
    vector never yields for ALL terms).
    """
    scale = 1.0 / (out_dim ** 0.5)
    signs = jl_signs(out_dim, in_dim, salt)
    R = F.array(*[F.array(*[F.lit(s) for s in row]) for row in signs])
    vd = F.col(vec_col).cast("array<double>")
    proj = F.transform(
        R,
        lambda row: F.aggregate(
            F.zip_with(vd, row, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        * F.lit(scale),
    )
    return df.withColumn(out_col, proj)


def squared_l2(a, b):
    """Sum of squared element differences between two array<double>
    columns — the same left-fold order as an explicit '+' chain (see
    random_project's parity note; squares are never -0.0)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


# --------------------------------------------------------------------------
# Distributed PCA (round 12): the projection/whitening step before ANN or
# clustering when JL's data-oblivious signs leave recall on the table.
# Second-moment accumulation is the classic two-stage distributed shape:
# one Arrow-batched pass emits per-batch partials (n, sum, Gram), a
# pos-keyed aggregate folds them to d^2+d+1 numbers, and the d x d
# eigendecomposition is driver-side numpy — bounded by the DIMENSION,
# never the corpus (the train_ivf_centroids discipline: bounded model
# math on the driver, distributed everything else).
# --------------------------------------------------------------------------


def partial_gram(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-Arrow-batch second-moment partials: one row (n, s[d], g[d*d])
    per batch — numpy X.T @ X per batch, nothing quadratic in rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    return emb.select(vec_col).mapInPandas(
        batches, "n bigint, s array<double>, g array<double>"
    )


def train_pca(
    emb: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean[d], components[k,d], eigvals[k]) of the population covariance,
    components row-orthonormal, eigenvalues descending. The driver holds
    d^2+d+1 doubles (the partials fold DISTRIBUTED via a pos-keyed
    aggregate — the collect is bounded by the dimension, not the corpus
    or the batch count)."""
    parts = partial_gram(emb, vec_col)
    flat = parts.select(
        F.posexplode(
            F.concat(
                F.array(F.col("n").cast("double")), F.col("s"), F.col("g")
            )
        ).alias("pos", "v")
    )
    rows = (
        flat.groupBy("pos").agg(F.sum("v").alias("v")).orderBy("pos").collect()
    )  # d^2 + d + 1 rows — bounded by dimension (module section note)
    vals = np.array([r.v for r in rows])
    d = int((-1 + (1 + 4 * (len(vals) - 1)) ** 0.5) / 2)  # len = 1 + d + d^2
    n = vals[0]
    mean = vals[1 : 1 + d] / n
    cov = vals[1 + d :].reshape(d, d) / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    return mean, evecs[:, order].T.copy(), evals[order]


def matrix_project(
    df: DataFrame,
    M: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "proj",
    center: np.ndarray | None = None,
) -> DataFrame:
    """Append proj[k] = sum_j (v[j] - center[j]) * M[k][j] — the
    random_project fold generalized to an arbitrary double matrix (same
    literal-array + transform/zip_with/aggregate shape, same left-fold
    cross-engine determinism, scan-stage only)."""
    rows = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in M]
    )
    vd = F.col(vec_col).cast("array<double>")
    if center is not None:
        c = F.array(*[F.lit(float(x)) for x in center])
        vd = F.zip_with(vd, c, lambda x, m: x - m)
    proj = F.transform(
        rows,
        lambda row: F.aggregate(
            F.zip_with(vd, row, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
    )
    return df.withColumn(out_col, proj)
