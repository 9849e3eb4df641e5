"""Native (C++/ctypes) host kernels: build + exact parity with the numpy
dense-path featurization (csrc/caster_host.cpp vs
data/featurize/protein.py + data/build.py)."""
import numpy as np
import pytest

from caster_dta_tpu.data import build
from caster_dta_tpu.data.featurize import pdb as pdb_feat
from caster_dta_tpu.data.synthetic import helix_backbone, write_pdb
from caster_dta_tpu.native import host

pytestmark = pytest.mark.skipif(not host.available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def pdb_file(tmp_path_factory):
    rng = np.random.default_rng(3)
    path = str(tmp_path_factory.mktemp("pdb") / "prot.pdb")
    n = 120
    seq = "".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), n))
    write_pdb(path, helix_backbone(n, rng), seq)
    return path


def _dense_graph(pdb_file, **kw):
    nf, ef, nt, et = pdb_feat.process_pdb(pdb_file, **kw)
    return build.dense_to_graph(nf, ef, nt, et)


@pytest.mark.parametrize("thresh,ttype,self_loops,vec", [
    (8.0, "dist", True, True),        # trained config shape (4A at nm scale)
    (8.0, "dist", False, True),
    (12, "num", False, True),
    (0.08, "prop", True, True),
    (8.0, "dist", True, False),       # non-vectorized concat form
])
def test_fused_matches_dense(pdb_file, thresh, ttype, self_loops, vec):
    kw = dict(dist_units="angstroms", edge_thresh=thresh, thresh_type=ttype,
              keep_self_loops=self_loops, vectorize_features=vec)
    want = _dense_graph(pdb_file, **kw)
    got = build.protein_graph_fused(pdb_file, **kw)
    assert got is not None
    assert got["n_nodes"] == want["n_nodes"]
    assert got["n_edges"] == want["n_edges"]
    np.testing.assert_array_equal(got["edge_index"], want["edge_index"])
    np.testing.assert_array_equal(got["node_type"], want["node_type"])
    np.testing.assert_array_equal(got["edge_type"], want["edge_type"])
    np.testing.assert_allclose(got["node_s"], want["node_s"], atol=1e-6)
    np.testing.assert_allclose(got["edge_s"], want["edge_s"], atol=2e-6)
    if vec:
        np.testing.assert_allclose(got["node_v"], want["node_v"], atol=1e-6)
        np.testing.assert_allclose(got["edge_v"], want["edge_v"], atol=2e-6)
    else:
        assert got["edge_v"] is None and want["edge_v"] is None


def test_sort_edges_by_dst():
    rng = np.random.default_rng(0)
    dst = rng.integers(0, 50, 400).astype(np.int32)
    perm = host.sort_edges_by_dst(dst)
    want = np.argsort(dst, kind="stable")
    np.testing.assert_array_equal(perm, want)


def test_knn_counts(pdb_file):
    src, dst, es, ev = host.protein_edges(
        pdb_feat.load_backbone_coords(pdb_file)[0][:, 1, :] * 10,
        10, "num", True)
    n = 120
    assert len(src) == n * 10
    # each source row has exactly k edges, self included (d=0 is nearest)
    counts = np.bincount(src, minlength=n)
    assert (counts == 10).all()
    assert all(np.any((src == i) & (dst == i)) for i in range(n))
