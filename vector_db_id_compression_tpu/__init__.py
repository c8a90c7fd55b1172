"""vector_db_id_compression_tpu — TPU-native lossless compression of vector IDs
for approximate nearest neighbor search.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
facebookresearch/vector_db_id_compression (the reference implementation of
"Lossless Compression of Vector IDs for Approximate Nearest Neighbor Search",
arXiv:2501.10479): lossless codecs for the identifiers stored in ANN index
structures — per-cluster ID lists of IVF indices and adjacency lists of graph
indices — integrated into the search path with deferred ID decoding.

Codecs (reference parity, see each module's docstring for file:line cites):
  - ROC / bits-back rANS multiset coding   (codecs.roc)
  - Elias-Fano monotone sequences          (codecs.elias_fano)
  - Wavelet tree over cluster assignments  (codecs.wavelet_tree)
  - Packed fixed-width bits                (codecs.packed_bits)

Unlike the reference (single-node CPU + OpenMP), compute here is expressed as
batched, static-shape JAX programs: lists are lanes, the sequential ANS chain
is a `lax.scan`, order statistics are dense vector ops, and multi-chip scaling
is `jax.sharding.Mesh` + `shard_map` data parallelism over lists.

64-bit integer arithmetic is required for the rANS head; we enable jax x64
mode at import. All public entry points work on CPU and TPU backends.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# honor an explicit JAX_PLATFORMS=cpu (tests, CI): the axon sitecustomize
# pins jax_platforms="axon,cpu" at interpreter start, overriding the env var
if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    _jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the codec scan kernels are expensive to compile;
# without this every CLI invocation recompiles from scratch. Only set when
# the application hasn't configured one (a library must not clobber it).
if _jax.config.jax_compilation_cache_dir is None:
    # default to a per-user location: a world-shared /tmp dir collides on
    # ownership/permissions between users on multi-user hosts
    _default_cache = _os.path.join(
        _os.environ.get("XDG_CACHE_HOME",
                        _os.path.expanduser("~/.cache")),
        "vdbidc", "jax")
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("VDBIDC_COMPILE_CACHE", _default_cache),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

__version__ = "0.1.0"
