"""Ray Data pipelines: index build, segment merge, BM25 query."""
