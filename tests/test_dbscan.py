"""Semantic gates for dbscan_q (C6): a full union-find DBSCAN
recompute in numpy, DBSCAN's structural invariants, and the honest
corpus reading."""

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.operators.dbscan_q import (
    _MINNB,
    dbscan_embeddings,
)

_EPS2 = 1.36


@pytest.fixture(scope="module")
def ref(sf_dir):
    d = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(d.embedding.values).astype(np.float64)
    ids = d.vec_id.to_numpy()
    n = len(V)
    D2 = ((V[:, None, :] - V[None, :, :]) ** 2).sum(-1)
    nb = (D2 <= _EPS2) & ~np.eye(n, dtype=bool)
    deg = nb.sum(1)
    core = deg >= _MINNB
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nb[i, j]:
                a, b = find(int(ids[i])), find(int(ids[j]))
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp = {}
    for i in range(n):
        if core[i]:
            comp[int(ids[i])] = find(int(ids[i]))
    role = {}
    for i in range(n):
        vid = int(ids[i])
        if core[i]:
            role[vid] = ("core", comp[vid])
        else:
            cands = [
                comp[int(ids[j])]
                for j in range(n)
                if core[j] and nb[i, j]
            ]
            role[vid] = (
                ("border", min(cands)) if cands else ("noise", None)
            )
    return {int(i): d for i, d in zip(ids, deg)}, role


def test_dbscan_matches_union_find(spark, sf_dir, ref):
    degs, roles = ref
    out = dbscan_embeddings(spark, sf_dir).toPandas().set_index("vec_id")
    assert len(out) == len(degs)
    for vid, (role, comp) in roles.items():
        got = out.loc[vid]
        assert got.nb_cnt == degs[vid], vid
        assert got.role == role, vid
        if comp is None:
            assert pd.isna(got.cluster)
        else:
            assert got.cluster == comp, vid


def test_dbscan_structure(spark, sf_dir):
    """DBSCAN invariants + the honest near-uniform-corpus reading:
    all three roles populated, one dominant dense component, noise
    has no cluster, cluster id = min member id of its cores."""
    out = dbscan_embeddings(spark, sf_dir).toPandas()
    rc = out["role"].value_counts()
    assert set(rc.index) == {"core", "border", "noise"}
    assert out.loc[out.role == "noise", "cluster"].isna().all()
    assert out.loc[out.role != "noise", "cluster"].notna().all()
    cores = out[out.role == "core"]
    for comp, grp in cores.groupby("cluster"):
        assert comp == grp.vec_id.min()
    # dominant blob
    assert out["n_members"].max() > 0.5 * len(out[out.role != "noise"])
    # n_members accounting
    sizes = out[out.role != "noise"].groupby("cluster").size()
    for comp, sz in sizes.items():
        assert (
            out.loc[out.cluster == comp, "n_members"] == sz
        ).all()
