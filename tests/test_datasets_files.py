"""File-backed dataset adapters exercised end to end on tiny fixtures.

The reference pulls SIFT1M/Deep1M from faiss.contrib and FB-ssnpp from .npy
files (custom_invlist_cpp/bench_invlists.py:50-55, qinco_datasets.py:18-51).
No real dataset ships in this environment, so these tests write tiny
on-disk fixtures in the exact formats (.fvecs/.ivecs/.npy) and drive one
bench iteration through each adapter — proving the file paths are live
code, not dead adapters.
"""

import numpy as np
import pytest

from vector_db_id_compression_tpu.bench import datasets as D
from vector_db_id_compression_tpu.bench.bench_invlists import run_bench


def write_fvecs(path, x):
    x = np.asarray(x, np.float32)
    n, d = x.shape
    rec = np.empty((n, d + 1), np.int32)
    rec[:, 0] = d
    rec[:, 1:] = x.view(np.int32)
    rec.tofile(path)


def write_ivecs(path, x):
    x = np.asarray(x, np.int32)
    n, d = x.shape
    rec = np.empty((n, d + 1), np.int32)
    rec[:, 0] = d
    rec[:, 1:] = x
    rec.tofile(path)


def _make_corpus(rng, nt, nb, nq, d):
    xt = rng.standard_normal((nt, d)).astype(np.float32)
    xb = rng.standard_normal((nb, d)).astype(np.float32)
    xq = xb[rng.integers(0, nb, nq)] + 0.01 * rng.standard_normal(
        (nq, d)).astype(np.float32)
    d2 = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    return xt, xb, xq, gt


@pytest.fixture(scope="module")
def corpus():
    return _make_corpus(np.random.default_rng(3), 200, 400, 20, 8)


def test_fvecs_ivecs_roundtrip(tmp_path, corpus):
    xt, xb, xq, gt = corpus
    write_fvecs(tmp_path / "x.fvecs", xb)
    write_ivecs(tmp_path / "g.ivecs", gt)
    np.testing.assert_array_equal(D.read_fvecs(tmp_path / "x.fvecs"), xb)
    np.testing.assert_array_equal(D.read_ivecs(tmp_path / "g.ivecs"), gt)


def test_sift1m_adapter_one_bench_iteration(tmp_path, corpus):
    xt, xb, xq, gt = corpus
    write_fvecs(tmp_path / "sift_learn.fvecs", xt)
    write_fvecs(tmp_path / "sift_base.fvecs", xb)
    write_fvecs(tmp_path / "sift_query.fvecs", xq)
    write_ivecs(tmp_path / "sift_groundtruth.ivecs", gt)

    ds = D.DatasetSIFT1M(root=str(tmp_path))
    assert (ds.nb, ds.d, ds.nq, ds.nt) == (400, 8, 20, 200)
    np.testing.assert_array_equal(ds.get_database(), xb)
    np.testing.assert_array_equal(ds.get_groundtruth(5), gt[:, :5])

    rows = run_bench(ds, "IVF8,Flat", runs=1, k=5, nprobes=(8,),
                     methods=["ref", "roc"],
                     out_csv=str(tmp_path / "out.csv"))
    by = {r["method"]: r for r in rows}
    # exhaustive probe of a tiny corpus: compressed == uncompressed recall
    assert by["roc"]["recall_1"] == by["ref"]["recall_1"] > 0.9
    assert (tmp_path / "out.csv").exists()


def test_deep1m_adapter_env_root(tmp_path, corpus, monkeypatch):
    xt, xb, xq, gt = corpus
    write_fvecs(tmp_path / "deep_learn.fvecs", xt)
    write_fvecs(tmp_path / "deep_base.fvecs", xb)
    write_fvecs(tmp_path / "deep_query.fvecs", xq)
    write_ivecs(tmp_path / "deep_groundtruth.ivecs", gt)
    monkeypatch.setenv("DEEP1M_DIR", str(tmp_path))
    ds = D.get_dataset("deep1m")
    assert isinstance(ds, D.DatasetDeep1M)
    assert ds.nb == 400 and ds.d == 8
    np.testing.assert_array_equal(ds.get_queries(), xq)


def test_fb_ssnpp_adapter_one_bench_iteration(tmp_path, corpus):
    xt, xb, xq, gt = corpus
    np.save(tmp_path / "database1M.npy", xb)
    np.save(tmp_path / "queries.npy", xq)
    np.save(tmp_path / "ground_truth1M.npy", gt)

    ds = D.DatasetFBSsnpp(basedir=str(tmp_path))
    assert (ds.nb, ds.d, ds.nq) == (400, 8, 20)
    assert len(ds.get_train()) == 400  # database prefix (tiny fixture)

    rows = run_bench(ds, "IVF8,Flat", runs=1, k=5, nprobes=(8,),
                     methods=["ref", "elias-fano"],
                     out_csv=str(tmp_path / "out.csv"))
    by = {r["method"]: r for r in rows}
    assert by["elias-fano"]["recall_1"] == by["ref"]["recall_1"] > 0.9


def test_missing_files_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        D.DatasetSIFT1M(root=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        D.DatasetFBSsnpp(basedir=str(tmp_path / "nope"))
