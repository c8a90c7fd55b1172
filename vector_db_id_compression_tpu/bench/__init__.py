"""Experiment drivers — the reference's L4 layer (SURVEY.md §1), natively:

  - :mod:`.datasets`                 — P6 + faiss.contrib adapters
  - :mod:`.bench_invlists`           — P1: IVF online bench
  - :mod:`.graph_dynamic_bench`      — P2: NSG online bench
  - :mod:`.graph_static_bench`       — P3: offline REC bits/edge
  - :mod:`.generate_graph_edgelists` — P4: zuckerli interchange export
  - :mod:`.search_ivf_qinco`         — P5: large-scale QINCo pipeline
"""

from . import datasets  # noqa: F401
