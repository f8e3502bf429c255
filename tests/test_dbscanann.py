"""C6b gates — certificate filter-and-verify DBSCAN over the pinned
md5-plane candidate graph (operators/dbscanann_q.py):

1. EXACTNESS: dbscan_ann ≡ the brute exact tier (dbscan_embeddings)
   row for row on the corpus — the zero-flag-flip claim, held by
   construction and asserted here end-to-end through Spark.
2. Stage pins at sf0.001 (measured via the DuckDB stage oracle):
   80 265 candidate pairs, 519/573 ε-edges (recall 0.906 ≥ the 0.85
   declared floor), 177 certified of 198 cores, 21 rescued, 323
   uncertain; n_cert_and_core == n_certified_cores is the one-sided
   certificate property (no false cores, ever).
3. Planted merge scenario: a deterministic 19-point unit-sphere
   construction (LCG seed 4) where a true ε-edge pair (two 4-point
   blobs at chord 1.129, all 16 table codes differing — verified in
   the construction) splits cc1, so the triangle-bound merge-verify
   stage MUST fire to reunite them; an antipodal blob proves the
   bound also PRUNES (lb = 2 > ε and 1.65 > ε pairs never reach
   exact verification); a 4-core clump + 1-neighbor satellite + two
   isolated points exercise border and noise through the rescue
   stage.  Expected roles/components recomputed by brute numpy
   DBSCAN inside the test.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

_TABLES, _BITS, _DIM = 16, 4, 64
_EPS2 = 1.36
_MINNB = 3


def _signs():
    return np.array(
        [
            [
                1
                if int(
                    hashlib.md5(f"lshp|{p}|{i}".encode()).hexdigest()[:8],
                    16,
                )
                % 2
                == 0
                else -1
                for i in range(_DIM)
            ]
            for p in range(_TABLES * _BITS)
        ],
        dtype=float,
    )


def _codes(X, signs):
    b = (X @ signs.T > 0).astype(int)
    c = np.zeros((len(X), _TABLES), dtype=int)
    for t in range(_TABLES):
        for r in range(_BITS):
            c[:, t] += b[:, t * _BITS + r] << r
        c[:, t] += t * 16
    return c


def _lcg_vec(seed, n=_DIM):
    s = seed
    out = []
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (2**64)
        out.append(((s >> 33) / 2**31) - 1.0)
    return np.array(out)


def _ortho(seedn, bases):
    x = _lcg_vec(seedn)
    for b in bases:
        x = x - (x @ b) * b
    return x / np.linalg.norm(x)


def _planted():
    """The 19-point scenario from the module header: blobs A/B whose
    cross ε-edges every table misses (forcing a merge), antipodal
    blob C (bound-pruned), a spread clump with a border satellite,
    two noise points."""
    seed = 4
    u = _lcg_vec(seed * 2 + 1)
    u = u / np.linalg.norm(u)
    v = _lcg_vec(seed * 2 + 2)
    v = v - (v @ u) * u
    v = v / np.linalg.norm(v)
    w = np.cos(1.2) * u + np.sin(1.2) * v
    g = _ortho(101, [u, v])
    h = _ortho(102, [u, v, g])
    q = _ortho(103, [u, v, g, h])
    clump = [g]
    for ang in (0.30, 0.25, 0.20):
        d = np.cos(ang) * g + np.sin(ang) * h
        clump.append(d / np.linalg.norm(d))
    b_ = np.cos(1.164) * g - np.sin(1.164) * h
    n1 = _ortho(104, [u, v, g, h, q])
    n2 = _ortho(105, [u, v, g, h, q, n1])
    X = np.stack(
        [u, u, u, u, w, w, w, w, -u, -u, -u, -u, *clump, b_, n1, n2]
    )
    return X


def _brute_dbscan(X):
    """Exact reference: roles + min-id components, the dbscan_q
    deterministic variant."""
    n = len(X)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    near = d2 <= _EPS2
    np.fill_diagonal(near, False)
    core = near.sum(1) >= _MINNB
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(n):
        for b in range(a + 1, n):
            if near[a, b] and core[a] and core[b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # canonical min-member ids
    groups = {}
    for c in range(n):
        if core[c]:
            groups.setdefault(find(c), []).append(c)
    comp = {}
    for mem in groups.values():
        m = min(mem)
        for c in mem:
            comp[c] = m
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = ("core", comp[i])
        else:
            cn = [comp[j] for j in range(n) if near[i, j] and core[j]]
            out[i] = ("border", min(cn)) if cn else ("noise", None)
    sizes = {}
    for role, c in out.values():
        if c is not None:
            sizes[c] = sizes.get(c, 0) + 1
    return out, sizes


def test_dbscan_ann_equals_exact_tier(spark, sf_dir):
    """Gate 1: zero flag flips on the corpus — the full 4-stage
    machine returns the brute tier's rows exactly."""
    from dtaidistance_spark.operators.dbscan_q import dbscan_embeddings
    from dtaidistance_spark.operators.dbscanann_q import dbscan_ann

    got = sorted(
        (r["vec_id"], r["label"], r["role"], r["cluster"], r["n_members"])
        for r in dbscan_ann(spark, sf_dir).collect()
    )
    want = sorted(
        (r["vec_id"], r["label"], r["role"], r["cluster"], r["n_members"])
        for r in dbscan_embeddings(spark, sf_dir)
        .drop("nb_cnt")
        .collect()
    )
    assert got == want
    roles = {}
    for _, _, role, _, _ in got:
        roles[role] = roles.get(role, 0) + 1
    assert roles == {"core": 198, "border": 196, "noise": 106}


def test_stage_pins_and_one_sided_certificates(spark, sf_dir):
    """Gate 2: the measured sf0.001 stage accounting, including the
    one-sided certificate identity and the integer-cleared recall
    floor."""
    from dtaidistance_spark.operators.dbscanann_q import (
        dbscan_ann_stage_check,
    )

    r = dbscan_ann_stage_check(spark, sf_dir).collect()[0]
    assert (
        r["n_points"],
        r["n_cand_pairs"],
        r["n_ann_eps_edges"],
        r["n_exact_eps_edges"],
        r["n_certified_cores"],
        r["n_exact_cores"],
        r["n_rescued_cores"],
        r["n_uncertain"],
    ) == (500, 80265, 519, 573, 177, 198, 21, 323)
    assert r["n_cert_and_core"] == r["n_certified_cores"]
    assert r["recall_floor_met"] is True


def test_planted_merge_prune_border_noise(spark):
    """Gate 3: the planted scenario — merge stage fires exactly once
    (blobs A+B reunited), the triangle bound prunes the antipodal
    pairs before any exact verification, border/noise flow through
    the rescue stage, and the final rows equal brute DBSCAN."""
    from dtaidistance_spark.operators.dbscanann_q import (
        _dbscan_ann_frames,
    )

    X = _planted()
    signs = _signs()
    C = _codes(X, signs)
    # construction invariants (deterministic — hard assert, no skip):
    # every table code differs across the A×B pair, none within clump
    assert all(C[0, t] != C[4, t] for t in range(_TABLES))
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    assert d2[0, 4] <= _EPS2  # the missed TRUE eps-edge
    want, want_sizes = _brute_dbscan(X)
    assert [want[i][0] for i in range(12, 19)] == [
        "core", "core", "core", "core", "border", "noise", "noise",
    ]
    v = spark.createDataFrame(
        [(i, 0, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, label int, e array<double>",
    )
    out, st = _dbscan_ann_frames(v)
    got = {
        r["vec_id"]: (r["role"], r["cluster"], r["n_members"])
        for r in out.collect()
    }
    for i in range(len(X)):
        role, comp = want[i]
        nm = want_sizes.get(comp) if comp is not None else None
        assert got[i] == (role, comp, nm), (i, got[i], (role, comp, nm))
    merges = {
        (r["ca"], r["cb"]) for r in st["merges"].collect()
    }
    assert merges == {(0, 4)}
    surv = {(r["ca"], r["cb"]) for r in st["merge_survivors"].collect()}
    assert (0, 4) in surv
    assert (0, 8) not in surv and (4, 8) not in surv  # bound-pruned
    certified = {r["vec_id"] for r in st["certified"].collect()}
    assert certified == set(range(16))  # all true cores, no satellite
    # rescue covered every uncertain point's verdict: the satellite
    # (border) and the isolated points are all outside certified
    assert {16, 17, 18}.isdisjoint(certified)
