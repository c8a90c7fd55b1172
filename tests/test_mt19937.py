"""MT19937 bit-exactness vs numpy's reference implementation (same algorithm
as std::mt19937 for 32-bit integer seeds)."""

import numpy as np

from vector_db_id_compression_tpu.core.mt19937 import MT19937, mt19937_pool


def _numpy_mt_stream(seed, count):
    # numpy.random.MT19937 implements the identical core generator; tempered
    # 32-bit outputs are obtained via random_raw on the Generator bit stream.
    bg = np.random.MT19937(seed)
    # seed via the raw 32-bit init (numpy seeds differently through SeedSequence
    # by default), so instead drive the state directly:
    state = np.empty(624, dtype=np.uint32)
    state[0] = seed
    for i in range(1, 624):
        state[i] = np.uint32(
            (1812433253 * (int(state[i - 1]) ^ (int(state[i - 1]) >> 30)) + i)
            & 0xFFFFFFFF
        )
    bg.state = {"bit_generator": "MT19937", "state": {"key": state, "pos": 624}}
    return bg.random_raw(count).astype(np.uint32)


def test_matches_numpy_mt19937():
    ref = _numpy_mt_stream(1234, 5000)
    assert np.array_equal(mt19937_pool(1234, 5000), ref)


def test_other_seed():
    ref = _numpy_mt_stream(42, 2000)
    assert np.array_equal(mt19937_pool(42, 2000), ref)


def test_clone_is_independent():
    g = MT19937(7)
    for _ in range(100):
        g()
    c = g.clone()
    a = [g() for _ in range(700)]  # crosses a twist boundary
    b = [c() for _ in range(700)]
    assert a == b
