"""utils/: artifact integrity stamping + throughput helper."""

import numpy as np

from vector_db_id_compression_tpu.utils import (
    artifact_checksum,
    stamp_artifact,
    throughput,
    verify_artifact,
)


def test_stamp_and_verify(tmp_path):
    p = tmp_path / "a.npz"
    np.savez(p, x=np.arange(10), y=np.ones((3, 3)))
    assert not verify_artifact(p)  # unstamped
    crc = stamp_artifact(p)
    assert verify_artifact(p)
    assert crc == artifact_checksum(p)
    # corrupt one array -> verification fails
    z = dict(np.load(p))
    z["x"] = z["x"] + 1
    np.savez(p, **z)
    assert not verify_artifact(p)


def test_stamp_invlists_artifact(tmp_path):
    from vector_db_id_compression_tpu.store.invlists import (
        InvertedLists,
        PackedBitsInvertedLists,
    )
    from vector_db_id_compression_tpu.store.serialize import save_invlists

    il = InvertedLists(4, 0)
    rng = np.random.default_rng(0)
    ids = rng.permutation(64).astype(np.uint64)
    for ln in range(4):
        il.add_entries(ln, np.sort(ids[ln * 16:(ln + 1) * 16]), None)
    c = PackedBitsInvertedLists(il)
    p = tmp_path / "c.npz"
    save_invlists(p, c)
    stamp_artifact(p)
    assert verify_artifact(p)


def test_throughput_helper():
    import jax.numpy as jnp

    x = jnp.arange(1024)
    rate, secs = throughput(lambda: (x + 1).sum(), items=1024, repeats=2)
    assert rate > 0 and secs > 0
