import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from vector_db_id_compression_tpu.search.ivf import load_index
from vector_db_id_compression_tpu.store.invlists import RocInvertedLists
from vector_db_id_compression_tpu.bench.datasets import get_dataset

ds = get_dataset('synthetic', synth_scale=1.0)
xq = ds.get_queries()
index = load_index('/tmp/qbig/qinco_index.npz')
cont = RocInvertedLists(index.invlists)
index.replace_invlists(cont)

# warm
D, L = index.search_positional(xq, 100, 32)
I = index._translate(L, False)
for label, fn in (
    ("search_positional", lambda: index.search_positional(xq, 100, 32)),
    ("_translate grouped", lambda: index._translate(L, False)),
    ("_harvest_codes", lambda: index._harvest_codes(L, True)),
):
    t0 = time.time(); fn(); print(f"{label:18s} {time.time()-t0:7.2f}s", flush=True)
