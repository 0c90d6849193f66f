"""Persistent index state: segment layout, manifests, checkpoints."""
