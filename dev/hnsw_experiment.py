#!/usr/bin/env python3
"""Graph-ANN (NSW/HNSW-class) measured decision — the ITQ treatment
(r10 verdict ask #4): bounded prototype vs the shipped IVF ladder at
matched recall, on the driver embeddings. The question is NOT "is HNSW a
good index" (it is, on a single node) but "does a graph index beat the
engine's IVF family at matched recall/cost UNDER SPARK'S EXECUTION
MODEL", where the candidates are:

  - IVF (shipped): route query to nprobe cells, scan cells exactly.
    Cost = distance computations; embarrassingly parallel, one shuffle.
  - NSW (prototype): greedy beam search over a proximity graph.
    Cost = distance computations along the walk; SEQUENTIAL pointer
    chasing per query — in Spark this only fits as a per-cell graph
    (IVF-NSW) or a broadcast graph on the driver.

Method: deterministic NSW (seeded insertion order = vec_id order,
M neighbors, efC=efS beam), recall@10 vs exact euclidean over held-out
queries, distance-computation counts as the cost metric (hardware-
neutral — wall time favors NumPy's vectorized IVF scans unfairly).
Corpora: sf0.1 (2,000 x 64) and the sf1 sweep set (20,000 x 64 incl. the
5,000-vector hot cluster). Deterministic throughout (seed 20260816).
"""
import time

import duckdb
import numpy as np

SEED = 20260816
K = 10
NQ = 50


def load(path):
    v = duckdb.sql(f"SELECT vec_id, embedding FROM '{path}' ORDER BY vec_id").fetchall()
    return np.array([e for _, e in v], dtype=np.float32)


class Counter:
    def __init__(self):
        self.n = 0

    def d2(self, X, q):
        """squared euclidean distances, counted."""
        self.n += X.shape[0] if X.ndim == 2 else 1
        d = X - q
        return (d * d).sum(-1)


def build_nsw(X, M, efC, cnt):
    """Deterministic NSW: insert in id order, connect each new node to its
    M nearest among already-inserted (found by beam search from node 0),
    symmetrize. Returns adjacency lists."""
    n = len(X)
    adj = [[] for _ in range(n)]
    for i in range(1, n):
        if i <= M:
            cand = list(range(i))
        else:
            cand = beam_search(X, adj, X[i], efC, cnt, n_nodes=i)
        d = cnt.d2(X[cand], X[i])
        order = np.argsort(d, kind="stable")[:M]
        for j in (np.array(cand)[order]).tolist():
            if j not in adj[i]:
                adj[i].append(j)
            if i not in adj[j]:
                adj[j].append(i)
    return adj


def beam_search(X, adj, q, ef, cnt, n_nodes=None):
    """Greedy best-first beam from node 0; returns visited candidates
    sorted by distance (the classic SEARCH-LAYER of HNSW)."""
    import heapq
    start = 0
    d0 = float(cnt.d2(X[start], q))
    visited = {start}
    frontier = [(d0, start)]          # min-heap
    results = [(-d0, start)]          # max-heap of best ef
    while frontier:
        d, u = heapq.heappop(frontier)
        if -results[0][0] < d and len(results) >= ef:
            break
        for w in adj[u]:
            if w in visited or (n_nodes is not None and w >= n_nodes):
                continue
            visited.add(w)
            dw = float(cnt.d2(X[w], q))
            if len(results) < ef or dw < -results[0][0]:
                heapq.heappush(frontier, (dw, w))
                heapq.heappush(results, (-dw, w))
                if len(results) > ef:
                    heapq.heappop(results)
    return [u for _, u in sorted((-d, u) for d, u in results)]


def ivf(X, nlist, nprobe, queries, cnt, seed=SEED):
    """k-means (few iters, deterministic init by smallest ids) + probe."""
    cents = X[:nlist].copy()
    for _ in range(3):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(nlist):
            m = a == c
            if m.any():
                cents[c] = X[m].mean(0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1)
    out = []
    for q in queries:
        dc = cnt.d2(cents, q)
        cells = np.argsort(dc, kind="stable")[:nprobe]
        mask = np.isin(assign, cells)
        idx = np.where(mask)[0]
        dq = cnt.d2(X[idx], q)
        out.append(idx[np.argsort(dq, kind="stable")[:K]])
    return out


def run(tag, X):
    rng = np.random.default_rng(SEED)
    qidx = rng.choice(len(X), NQ, replace=False)
    queries = X[qidx]
    exact = []
    for q in queries:
        d = ((X - q) ** 2).sum(-1)
        exact.append(set(np.argsort(d, kind="stable")[:K].tolist()))

    def recall(got):
        return np.mean([len(set(g.tolist() if hasattr(g, "tolist") else g)
                            & e) / K for g, e in zip(got, exact)])

    print(f"== {tag}: n={len(X)}")
    # NSW at a few beam widths
    for M, efC in [(8, 32), (16, 64)]:
        cb = Counter()
        t0 = time.time()
        adj = build_nsw(X, M, efC, cb)
        tb = time.time() - t0
        for efS in [32, 64, 128]:
            cq = Counter()
            got = [beam_search(X, adj, q, efS, cq)[:K] for q in queries]
            r = recall(got)
            print(f"  NSW M={M} efC={efC} efS={efS}: recall@10={r:.3f} "
                  f"dist/query={cq.n / NQ:.0f} build_dist={cb.n} build_s={tb:.1f}")
    # IVF at a few probe widths
    nlist = max(int(np.sqrt(len(X))), 8)
    for frac in [2, 4, 8]:
        nprobe = max(nlist // frac, 1)
        cq = Counter()
        got = ivf(X, nlist, nprobe, queries, cq)
        r = recall(got)
        print(f"  IVF nlist={nlist} nprobe={nprobe}: recall@10={r:.3f} "
              f"dist/query={cq.n / NQ:.0f} (train excl.)")


if __name__ == "__main__":
    run("sf0.1 driver embeddings", load("/root/testdata/sf0.1/embeddings.parquet"))
    run("sf1 sweep embeddings (hot cluster)", load("/tmp/graft_sf1/embeddings.parquet"))
