"""Stateful components: trained models, union-find, round checkpoints.

Everything the reference kept in one driver process's RAM
(SURVEY.md §3, "Where state lives") is externalized here into either
(a) driver-fit models broadcast via ``ray.put``, (b) Dataset-shaped state
(label tables), or (c) Parquet round checkpoints with lineage counters.
"""
