"""Distributed: device meshes, list sharding, deterministic gather."""
