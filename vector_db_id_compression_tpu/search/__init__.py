"""Search: k-means coarse quantizer, PQ, IVF with deferred ID decoding,
graph search."""
