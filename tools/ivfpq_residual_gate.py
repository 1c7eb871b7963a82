#!/usr/bin/env python3
"""Numpy gate for residual-encoded IVFADC (round-12 task #2).

Question: does coding the RESIDUAL (x - cell_centroid) instead of the
raw vector against the same m=8 x 256 sampled-anchor codebook buy
enough recall@10 at nprobe=8 (~25% of code bytes) to reach the 0.8
shipping floor?

This mirrors the engine's mechanisms exactly where they matter:
 - cells: seeded Lloyd k-means (k=32) over L2-normalized vectors
   (AnnIndex.ivfpq8 uses seeded spark.ml k-means -- same family);
 - codebook: 256 content-sampled vectors, per-subspace anchor =
   sampled vector's subvector slice, code = argmin L2
   (SimilarityOps2.pqAnchorsCodesOf); the residual variant samples
   RESIDUAL vectors the same way;
 - probe: rank cells by query-centroid cosine, scan nprobe cells' codes,
   ADC approx dot (+ q.centroid for the residual variant), keep a
   100-candidate funnel, exact-rerank, score recall@10 vs exact top-10
   (AnnEval.ivfpqTopK semantics; 16-query sample vec_id % 7 == 3).

It also measures the coding-INDEPENDENT ceiling: recall of the EXACT
vectors restricted to the probed cells -- no code improvement can beat
that, so if ceiling@np8 < 0.8 the verdict's target is unreachable by
residual coding (or any coding) at np8 on this corpus.

Usage: python3 tools/ivfpq_residual_gate.py [sf_dir ...]

MEASURED VERDICT (2026-08-15, gate run before any engine build):

    sf0.01 nprobe= 8: ceiling=0.600 raw_pq8=0.600 residual_pq8=0.600
    sf0.01 nprobe=16: ceiling=0.844 raw_pq8=0.837 residual_pq8=0.844
    sf0.1  nprobe= 8: ceiling=0.650 raw_pq8=0.625 residual_pq8=0.613
    sf0.1  nprobe=16: ceiling=0.887 raw_pq8=0.812 residual_pq8=0.800

NEGATIVE RESULT, conclusive: the nprobe=8 CEILING (exact vectors,
probed cells only) is 0.60-0.65 -- below the 0.8 target before any
coding loss enters, so residual encoding (or any encoding) cannot
reach 0.8 at 25% of code bytes on this corpus. The raw sampled-anchor
codes already sit at/within 0.03 of the ceiling at both dials: the
100-candidate funnel + exact rerank absorbs essentially all
quantization loss, leaving nothing for residual coding to recover
(measured gain +-0.01, inside sampling noise). Residual encoding's
textbook win assumes cell-local structure that this near-random
corpus lacks (cell means have small norm, so residual ~= raw).
Engine path NOT built, per the gate-first discipline.
"""
import sys
import numpy as np
import pyarrow.parquet as pq
import hashlib

K_CELLS, M, SUB, K_ANCH, FUNNEL, TOPK, NQ = 32, 8, 8, 256, 100, 10, 16


def load(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], emb[order]


def kmeans(x, k, seed, iters=20):
    rng = np.random.RandomState(seed)
    n = x.shape[0]
    cent = x[rng.choice(n, k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(k):
            if (a == c).any():
                cent[c] = x[a == c].mean(0)
    return cent, a


def hash_sample(ids, k):
    """The engine's content-hash anchor sample: first k vec_ids by
    md5(vec_id || 'pq')."""
    keys = [hashlib.md5(f"{i}pq".encode()).hexdigest() for i in ids]
    return np.argsort(np.array(keys))[:k]


def pq_codes(vectors, anchors):
    """codes[n, M]: per-subspace argmin-L2 anchor."""
    codes = np.empty((vectors.shape[0], M), dtype=np.int32)
    for m in range(M):
        vs = vectors[:, m * SUB:(m + 1) * SUB]
        as_ = anchors[:, m * SUB:(m + 1) * SUB]
        d = ((vs[:, None, :] - as_[None, :, :]) ** 2).sum(-1)
        codes[:, m] = d.argmin(1)
    return codes


def adc_dot(q, codes, anchors):
    """approx dot(q, reconstruction) via per-subspace lookup tables."""
    tables = np.stack([
        anchors[:, m * SUB:(m + 1) * SUB] @ q[m * SUB:(m + 1) * SUB]
        for m in range(M)])  # [M, K_ANCH]
    return tables[np.arange(M)[:, None], codes.T].sum(0)


def recall_at(probe_rows, exact10, emb, qi, nq_norm):
    """exact rerank of the funnel (float cosine; the gate's analogue of
    the engine's quantized kernel), then recall@10."""
    if probe_rows.size == 0:
        return 0.0
    sims = emb[probe_rows] @ emb[qi] / (
        np.linalg.norm(emb[probe_rows], axis=1) * nq_norm + 1e-12)
    top = probe_rows[np.argsort(-sims, kind="stable")[:TOPK]]
    return len(set(top) & set(exact10)) / TOPK


def run(sf):
    ids, emb = load(sf)
    n = len(ids)
    norms = np.linalg.norm(emb, axis=1)
    unit = emb / np.maximum(norms[:, None], 1e-12)
    cents, assign = kmeans(unit, K_CELLS, seed=20260815)

    s = hash_sample(ids, K_ANCH)
    raw_anchors = emb[s]
    raw = pq_codes(emb, raw_anchors)
    # residual against the cell centroid in RAW space: the engine
    # normalizes for cell ASSIGNMENT only; codes are built on raw-space
    # vectors, so the residual is raw - (raw-space cell mean)
    raw_cents = np.stack([emb[assign == c].mean(0) if (assign == c).any()
                          else np.zeros(emb.shape[1]) for c in range(K_CELLS)])
    resid = emb - raw_cents[assign]
    res_anchors = resid[s]
    res = pq_codes(resid, res_anchors)

    qidx = [i for i in range(n) if ids[i] % 7 == 3][:NQ]
    cos = unit @ unit.T
    out = {}
    for nprobe in (8, 16):
        ceil_r, raw_r, res_r = [], [], []
        for qi in qidx:
            exact = np.argsort(-cos[qi], kind="stable")
            exact10 = [j for j in exact if j != qi][:TOPK]
            csim = cents @ unit[qi]
            probe_cells = np.argsort(-csim, kind="stable")[:nprobe]
            rows = np.array([j for j in range(n)
                             if assign[j] in set(probe_cells) and j != qi])
            ceil_r.append(len(set(rows) & set(exact10)) / TOPK)
            # raw ADC funnel
            d_raw = adc_dot(emb[qi], raw[rows], raw_anchors)
            fun = rows[np.argsort(-d_raw, kind="stable")[:FUNNEL]]
            raw_r.append(recall_at(fun, exact10, emb, qi, norms[qi]))
            # residual ADC funnel: approx dot = q.c_cell + q.residual_hat
            d_res = adc_dot(emb[qi], res[rows], res_anchors) \
                + (raw_cents[assign[rows]] @ emb[qi])
            fun = rows[np.argsort(-d_res, kind="stable")[:FUNNEL]]
            res_r.append(recall_at(fun, exact10, emb, qi, norms[qi]))
        out[nprobe] = (np.mean(ceil_r), np.mean(raw_r), np.mean(res_r))
    return out


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    for sf in dirs:
        r = run(sf)
        for np_, (c, a, b) in r.items():
            print(f"{sf} nprobe={np_:2d}: ceiling={c:.3f} raw_pq8={a:.3f} "
                  f"residual_pq8={b:.3f} (residual gain {b - a:+.3f})")
