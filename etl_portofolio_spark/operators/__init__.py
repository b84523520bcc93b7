"""Operator library: dedup, similarity search, text analysis, multimodal.

These are the large-scale training-data-pipeline operators layered on
top of the reference-parity surface (SURVEY.md §7 phase 4). Everything
is built from DataFrame primitives (explode/groupBy/join/window) so
Catalyst plans and AQE re-plans them; Python appears only in the
multimodal mapInPandas path (Arrow-batched).
"""
