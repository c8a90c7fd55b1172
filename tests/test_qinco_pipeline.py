"""End-to-end large-scale pipeline (bench/search_ivf_qinco.py): train → add →
search with deferred ID decoding + neural re-rank, on a tiny dataset.
Oracles: phases resume from disk artifacts; re-ranked recall beats or matches
the scan shortlist; every id_compression mode returns identical ids (lossless
IDs ⇒ the shortlist sets agree)."""

import argparse

import numpy as np
import pytest

from vector_db_id_compression_tpu.bench.datasets import SyntheticDataset
from vector_db_id_compression_tpu.bench.search_ivf_qinco import (
    run_add,
    run_search,
    run_train,
)


def make_args(workdir, comp="none", defer=False):
    return argparse.Namespace(
        todo=["train", "add", "search"], dataset="synthetic",
        fb_ssnpp_dir=None, synth_scale=1, workdir=str(workdir),
        nlist=16, M=4, ksub=32, hidden=32, kmeans_niter=8, qinco_steps=150,
        seed=0, id_compression=comp, defer_id_decoding=defer,
        nprobe=8, nshort=30, k=10, runs=1,
    )


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(8, 1500, 3000, 50)


@pytest.fixture(scope="module")
def trained(ds, tmp_path_factory):
    wd = tmp_path_factory.mktemp("qinco_work")
    args = make_args(wd)
    run_train(ds, args, wd)
    run_add(ds, args, wd)
    return wd


def test_search_none(ds, trained):
    out = run_search(ds, make_args(trained, "none", defer=True), trained)
    r1 = out["results"][0]["recalls"]["1"]
    r10 = out["results"][0]["recalls"]["10"]
    assert r10 >= r1
    assert r10 > 0.5, out["results"]


@pytest.mark.parametrize("comp", ["packed-bits", "elias-fano", "roc",
                                  "wavelet-tree"])
def test_search_compressed_matches_none(ds, trained, comp):
    """ID compression is lossless, but codecs that physically reorder payload
    codes within a list (ROC: sampling order; EF: ascending ids) can swap
    equal-distance candidates at the nshort boundary of the quantized scan —
    so recalls must agree within a tie-break tolerance, not bit-exactly (the
    exact-equality oracle lives in tests/test_ivf.py on flat storage, where
    ties are measure-zero)."""
    base = run_search(ds, make_args(trained, "none", defer=True), trained)
    got = run_search(ds, make_args(trained, comp, defer=True), trained)
    for r in ("1", "10"):
        assert abs(got["results"][0]["recalls"][r]
                   - base["results"][0]["recalls"][r]) <= 0.06
    assert got["bits_per_id"] < 64.0


def test_search_non_deferred_matches(ds, trained):
    """The non-deferred baseline branch (single scan + translate + harvest)
    must return the same recalls as the deferred path on the same index."""
    a = run_search(ds, make_args(trained, "none", defer=True), trained)
    b = run_search(ds, make_args(trained, "none", defer=False), trained)
    assert a["results"][0]["recalls"] == b["results"][0]["recalls"]


def test_decode_chunked_matches_oneshot(ds, trained):
    """QincoModel.decode chunks big batches (fixed compiled shape + padded
    tail); result must equal the one-shot decode."""
    from vector_db_id_compression_tpu.bench.search_ivf_qinco import load_index

    index = load_index(make_args(trained), trained)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, index.qinco.ksub,
                         size=(257, index.qinco.M)).astype(np.int32)
    one = index.qinco.decode(codes)
    chunked = index.qinco.decode(codes, batch=64)
    np.testing.assert_allclose(chunked, one, rtol=1e-6, atol=1e-6)
