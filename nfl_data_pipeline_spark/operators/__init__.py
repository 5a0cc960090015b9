"""Operator library: composable DataFrame transformations.

``relational`` — the thin ops the reference repeats (top-1 per group,
positional bind_cols, grouped rescale); ``text`` / ``dedup`` /
``similarity`` / ``multimodal`` — the large-scale training-data
operators (SURVEY.md §7 phase 6); ``hashing`` — cross-engine
deterministic hash primitives shared by dedup and fingerprinting.
"""
