"""Numpy prototype for the OPQ arm (r12 VERDICT ask #3): before any
Spark code, measure which rotation family actually buys recall at
equal code bytes (m=8 x ksub=8) on the clustered fixture.

Candidate rotations applied to the RESIDUAL frame (the FAISS
"OPQ,IVF,PQ" composition) and to RAW vectors:
  perm  - variance-balancing dimension PERMUTATION (greedy min-sum
          allocation of variance-sorted dims to subspaces) — the only
          family replayable with exact DECIMAL/integer arithmetic in
          a DuckDB oracle (the pq_codebooks_fit discipline; a dense
          SVD rotation is not).
  svd   - full non-parametric OPQ (alternating PQ-train / Procrustes
          via SVD, Ge et al. 2014) — prototype-only ceiling; NOT
          implementable under the oracle discipline.

Run: python scripts/proto_opq.py [sf_dir]
"""
from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

from proto_clustered_fixture import (
    NQ, K, PROBES, make_pq_codebooks, centers_for, lloyd_ip, pq_fit_l2,
    encode_res_l2, adc,
)


def perm_balanced(var, m, dsub):
    """Greedy min-sum allocation: dims sorted by variance desc (ties
    asc), each assigned to the non-full subspace with the smallest
    variance sum (ties lowest id). Returns perm where perm[j*dsub+t]
    = source dim (new vector = x[perm])."""
    order = sorted(range(len(var)), key=lambda d: (-var[d], d))
    sums = [0.0] * m
    fill = [[] for _ in range(m)]
    for d in order:
        cand = [j for j in range(m) if len(fill[j]) < dsub]
        j = min(cand, key=lambda j: (sums[j], j))
        fill[j].append(d)
        sums[j] += var[d]
    return np.array([d for sub in fill for d in sub])


def opq_svd(X, B0, iters=8):
    """Non-parametric OPQ: alternate (PQ on R@X, Procrustes R)."""
    d = X.shape[1]
    R = np.eye(d)
    B = B0.copy()
    for _ in range(iters):
        XR = X @ R.T
        B = pq_fit_l2(XR, B, iters=1)
        codes = encode_res_l2(XR, B)
        m, ksub, dsub = B.shape
        Xhat = np.concatenate(
            [B[j][codes[:, j]] for j in range(m)], axis=1
        )
        U, _, Vt = np.linalg.svd(Xhat.T @ X)
        R = (U @ Vt).T.T  # R: d x d with Xhat ~ R @ x ; solve argmin |R x - xhat|
        R = (U @ Vt)      # careful below
        # Procrustes: min_R ||X R^T - Xhat||_F  => R = V U^T of svd(Xhat^T X)
        U2, _, V2t = np.linalg.svd(Xhat.T @ X)
        R = (U2 @ V2t)
    return R, B


def recall_for(X, cell, cent, Q, order, truth, codes, B, offset):
    sc = adc(Q, codes, B, offset=offset)
    out = {}
    n = len(X)
    for p in PROBES:
        hits = 0
        for qi in range(NQ):
            pc = set(order[qi, :p])
            cand = np.where(np.isin(cell, list(pc)) & (np.arange(n) != qi))[0]
            if len(cand) == 0:
                continue
            top = cand[np.argsort(-sc[qi, cand])[:K]]
            hits += len(set(top) & set(truth[qi]))
        out[p] = hits / (NQ * K)
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    X0 = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lab = np.array(t["label"].to_pylist())
    cents = centers_for(lab.max(), X0.shape[1])

    for spread, tag in ((0.15, "clustered"), (0.0, "isotropic")):
        X = X0 + spread * cents[lab]
        n, dim = X.shape
        h = dim // 2
        cb_imi = make_pq_codebooks(dim, 2, 8, seed=23)
        cb_pq = make_pq_codebooks(dim, 8, 8, seed=11)

        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        sims = Xn[:NQ] @ Xn.T
        for qi in range(NQ):
            sims[qi, qi] = -np.inf
        truth = np.argsort(-sims, axis=1)[:, :K]

        C1 = lloyd_ip(X[:, :h], cb_imi[0])
        C2 = lloyd_ip(X[:, h:], cb_imi[1])
        a1 = np.argmax(X[:, :h] @ C1.T, axis=1)
        a2 = np.argmax(X[:, h:] @ C2.T, axis=1)
        cell = a1 * 8 + a2
        cent = np.concatenate([C1[a1], C2[a2]], axis=1)
        R = X - cent
        Q = X[:NQ]
        s1 = Q[:, :h] @ C1.T
        s2 = Q[:, h:] @ C2.T
        order = np.argsort(-(s1[:, :, None] + s2[:, None, :]).reshape(NQ, 64),
                           axis=1)
        off = Q @ cent.T

        print(f"=== {tag} (spread={spread})")
        # residual baseline
        cb_res = pq_fit_l2(R, cb_pq)
        rr = recall_for(X, cell, cent, Q, order, truth,
                        encode_res_l2(R, cb_res), cb_res, off)
        print("  residual          ", rr)

        # perm-OPQ on residuals: balance residual variance
        var = R.var(axis=0)
        perm = perm_balanced(var, 8, 8)
        Rp = R[:, perm]
        cb_p = pq_fit_l2(Rp, cb_pq)
        codes_p = encode_res_l2(Rp, cb_p)
        # ADC on permuted query residual-lut: offset identical; LUT uses
        # permuted q — q_sub must be permuted the same way
        Qp = Q[:, perm]
        sc = np.zeros((NQ, n))
        m, ksub, dsub = cb_p.shape
        for j in range(m):
            lut = Qp[:, j*dsub:(j+1)*dsub] @ cb_p[j].T
            sc += lut[:, codes_p[:, j]]
        sc += off
        pr = {}
        for p in PROBES:
            hits = 0
            for qi in range(NQ):
                pcs = set(order[qi, :p])
                cand = np.where(np.isin(cell, list(pcs)) & (np.arange(n) != qi))[0]
                top = cand[np.argsort(-sc[qi, cand])[:K]]
                hits += len(set(top) & set(truth[qi]))
            pr[p] = hits / (NQ * K)
        print("  perm-opq residual ", pr)

        # svd-OPQ ceiling on residuals
        Rrot, cb_s = opq_svd(R, cb_pq, iters=8)
        Rs = R @ Rrot.T
        codes_s = encode_res_l2(Rs, cb_s)
        Qs = Q @ Rrot.T
        sc = np.zeros((NQ, n))
        for j in range(m):
            lut = Qs[:, j*dsub:(j+1)*dsub] @ cb_s[j].T
            sc += lut[:, codes_s[:, j]]
        sc += off
        sr = {}
        for p in PROBES:
            hits = 0
            for qi in range(NQ):
                pcs = set(order[qi, :p])
                cand = np.where(np.isin(cell, list(pcs)) & (np.arange(n) != qi))[0]
                top = cand[np.argsort(-sc[qi, cand])[:K]]
                hits += len(set(top) & set(truth[qi]))
            sr[p] = hits / (NQ * K)
        print("  svd-opq residual  ", sr)


if __name__ == "__main__":
    main()
