"""The similarity family's numeric contract (similarity.py module
docstring): embedding vectors are finite with non-zero L2 norm. The
argmax/argmin formulations are intentionally not NaN-stable — NaN
cosines would make the Spark struct-argmin and a SQL ORDER BY oracle
disagree — so the contract is enforced on the DATA the oracles run
over rather than guarded per-expression. This test pins that the
driver fixtures actually satisfy it at every scale the gate uses."""

from __future__ import annotations

import math
import os

import pytest


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_fixture_embeddings_have_nonzero_finite_norms(sf):
    path = f"/root/testdata/{sf}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    import pyarrow.parquet as pq

    vecs = pq.read_table(path).column("embedding").to_pylist()
    assert vecs, "fixture unexpectedly empty"
    for v in vecs:
        assert v, "empty embedding vector"
        s = 0.0
        for x in v:
            assert x is not None and math.isfinite(x)
            s += float(x) * float(x)
        assert s > 0.0, "zero-norm embedding violates the contract"
