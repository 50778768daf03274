"""Numpy prototype for the CLUSTERED embeddings fixture (r12 VERDICT
ask #1): before committing any Spark code, confirm that a
mixture-of-Gaussians variant of the embeddings table actually
SEPARATES the ANN arms (trained-vs-seeded coarse, residual-vs-raw PQ)
whose deltas are 0.02-0.05 on the near-isotropic driver corpus.

Fixture construction (designed to be replayable by BOTH engines from
the existing parquet, so the DuckDB oracle needs no side files):

    cid        = label                     (existing column, 10 values)
    center[c][d] = (((c+1)*73 + d*37) % 13 - 6) / 6.0   (integer-exact)
    cvec       = embedding + spread * center

`spread` controls the cluster-variance share: 0 reproduces the
isotropic corpus; at spread s the between-cluster energy is
~s^2*||center||^2 ~ 25 s^2 vs within ~1.

Arms mirrored from queries.imi_pq_residual_recall /
imi_ivf_recall mechanics (IP-argmax coarse halves, seeded
make_pq_codebooks geometry, 2-iteration Lloyd with mean updates,
L2-argmin residual codes, ADC = LUT sum (+ <q,cent> offset for
residual), probes = top-P product cells by summed half scores,
truth = cosine top-5 excluding self, 50 queries).

Run:  python scripts/proto_clustered_fixture.py [sf_dir]
Prints a table of recall@5 per (spread, arm, probes) and the
separation ratios vs spread=0.
"""
from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

NQ = 50
K = 5
PROBES = (4, 8, 16)


def make_pq_codebooks(dim, m, ksub, seed):
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((m, ksub, dim // m))
    c /= np.linalg.norm(c, axis=2, keepdims=True)
    return c


def centers_for(labels_max, dim):
    c = np.arange(labels_max + 1)[:, None]
    d = np.arange(dim)[None, :]
    return ((((c + 1) * 73 + d * 37) % 13) - 6) / 6.0


def lloyd_ip(X, C0, iters=2):
    """IP-argmax assignment + mean update (kmeans_fit semantics)."""
    C = C0.copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            mask = a == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
    return C


def pq_fit_l2(R, B0, iters=2):
    """Per-subspace L2 k-means, jointly (pq_codebooks_fit semantics)."""
    B = B0.copy()
    m, ksub, dsub = B.shape
    for _ in range(iters):
        for j in range(m):
            sub = R[:, j * dsub:(j + 1) * dsub]
            sc = sub @ B[j].T - 0.5 * (B[j] * B[j]).sum(axis=1)[None, :]
            a = np.argmax(sc, axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    B[j, c] = sub[mask].mean(axis=0)
    return B


def encode_raw(X, B):
    m, ksub, dsub = B.shape
    codes = np.empty((len(X), m), dtype=np.int32)
    for j in range(m):
        codes[:, j] = np.argmax(X[:, j * dsub:(j + 1) * dsub] @ B[j].T, axis=1)
    return codes


def encode_res_l2(R, B):
    m, ksub, dsub = B.shape
    codes = np.empty((len(R), m), dtype=np.int32)
    for j in range(m):
        sub = R[:, j * dsub:(j + 1) * dsub]
        sc = sub @ B[j].T - 0.5 * (B[j] * B[j]).sum(axis=1)[None, :]
        codes[:, j] = np.argmax(sc, axis=1)
    return codes


def adc(Q, codes, B, offset=None):
    """ADC scores (nq, n): LUT sum, plus per-(q, n) offset if given."""
    m, ksub, dsub = B.shape
    s = np.zeros((len(Q), len(codes)))
    for j in range(m):
        lut = Q[:, j * dsub:(j + 1) * dsub] @ B[j].T    # (nq, ksub)
        s += lut[:, codes[:, j]]
    if offset is not None:
        s += offset
    return s


def run_arms(X, label):
    """Recall@5 per (arm, probes) for one corpus variant."""
    n, dim = X.shape
    h = dim // 2
    cb_imi = make_pq_codebooks(dim, 2, 8, seed=23)
    cb_pq = make_pq_codebooks(dim, 8, 8, seed=11)

    # cosine truth, top-5 excl self, queries = first NQ ids
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn[:NQ] @ Xn.T
    np.fill_diagonal(sims[:, :NQ], -np.inf) if False else None
    for qi in range(NQ):
        sims[qi, qi] = -np.inf
    truth = np.argsort(-sims, axis=1)[:, :K]

    # trained coarse (per half, 2 Lloyd iters from the seeded books)
    C1 = lloyd_ip(X[:, :h], cb_imi[0])
    C2 = lloyd_ip(X[:, h:], cb_imi[1])

    a1 = np.argmax(X[:, :h] @ C1.T, axis=1)
    a2 = np.argmax(X[:, h:] @ C2.T, axis=1)
    cell = a1 * 8 + a2
    cent = np.concatenate([C1[a1], C2[a2]], axis=1)     # (n, dim)
    Rres = X - cent

    cb_res = pq_fit_l2(Rres, cb_pq)

    codes_raw = encode_raw(X, cb_pq)
    codes_res = encode_res_l2(Rres, cb_res)

    Q = X[:NQ]
    # probe order: top-P product cells by summed half scores
    s1 = Q[:, :h] @ C1.T                                 # (nq, 8)
    s2 = Q[:, h:] @ C2.T
    cellscore = s1[:, :, None] + s2[:, None, :]          # (nq, 8, 8)
    order = np.argsort(-cellscore.reshape(NQ, 64), axis=1)

    # ADC scores
    sc_raw = adc(Q, codes_raw, cb_pq)
    off = Q @ cent.T                                     # <q, centroid(cell(n))>
    sc_res = adc(Q, codes_res, cb_res, offset=off)

    out = {}
    for arm, sc in (("raw", sc_raw), ("residual", sc_res)):
        for p in PROBES:
            hits = 0
            for qi in range(NQ):
                probe_cells = set(order[qi, :p])
                cand = np.where(
                    np.isin(cell, list(probe_cells)) & (np.arange(n) != qi)
                )[0]
                if len(cand) == 0:
                    continue
                top = cand[np.argsort(-sc[qi, cand])[:K]]
                hits += len(set(top) & set(truth[qi]))
            out[(arm, p)] = hits / (NQ * K)
    # coarse-quality probe: exact cosine within probed cells (the
    # imi_ivf_recall shape) for seeded vs trained coarse at probes=4
    for tag, (D1, D2) in (("seeded", (cb_imi[0], cb_imi[1])),
                          ("trained", (C1, C2))):
        b1 = np.argmax(X[:, :h] @ D1.T, axis=1)
        b2 = np.argmax(X[:, h:] @ D2.T, axis=1)
        bc = b1 * 8 + b2
        t1 = Q[:, :h] @ D1.T
        t2 = Q[:, h:] @ D2.T
        cs = (t1[:, :, None] + t2[:, None, :]).reshape(NQ, 64)
        orderc = np.argsort(-cs, axis=1)
        hits = 0
        for qi in range(NQ):
            pc = set(orderc[qi, :4])
            cand = np.where(np.isin(bc, list(pc)) & (np.arange(n) != qi))[0]
            if len(cand) == 0:
                continue
            top = cand[np.argsort(-sims[qi, cand])[:K]]
            hits += len(set(top) & set(truth[qi]))
        out[(f"ivf_exact_{tag}", 4)] = hits / (NQ * K)
    return out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    X0 = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lab = np.array(t["label"].to_pylist())
    cents = centers_for(lab.max(), X0.shape[1])

    base = None
    for spread in (0.0, 0.15, 0.3, 0.5):
        X = X0 + spread * cents[lab]
        r = run_arms(X, lab)
        if spread == 0.0:
            base = r
        bshare = round(
            float(
                np.var(spread * cents[lab], axis=0).sum()
                / (np.var(X, axis=0).sum())
            ),
            3,
        )
        print(f"--- spread={spread}  between-var share≈{bshare}")
        for key in sorted(r):
            delta = r[key] - base[key]
            print(f"  {key[0]:>18} p={key[1]:>2}  recall={r[key]:.3f}  "
                  f"(vs iso {base[key]:.3f}, Δ{delta:+.3f})")
        res_gain = {p: r[("residual", p)] - r[("raw", p)] for p in PROBES}
        iso_gain = {p: base[("residual", p)] - base[("raw", p)] for p in PROBES}
        print(f"  residual-vs-raw gain {res_gain} (iso {iso_gain})")
        tr = r[("ivf_exact_trained", 4)] - r[("ivf_exact_seeded", 4)]
        ti = base[("ivf_exact_trained", 4)] - base[("ivf_exact_seeded", 4)]
        print(f"  trained-vs-seeded coarse gain {tr:+.3f} (iso {ti:+.3f})")


if __name__ == "__main__":
    main()
