"""Distributed operators: chunking, dedup, top-k search, ANN, quality stats."""
