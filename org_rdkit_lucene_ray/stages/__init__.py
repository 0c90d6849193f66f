"""Reusable Ray Data stages: text statistics, dedup, ANN, windows."""
