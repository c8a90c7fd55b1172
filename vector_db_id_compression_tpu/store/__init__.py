"""Containers: ragged list batching, compressed inverted lists, graphs,
serialization."""
