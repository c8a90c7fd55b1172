"""Neural models: QINCo-style residual quantizer for large-scale re-ranking."""
