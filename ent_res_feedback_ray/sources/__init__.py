"""Sources: Parquet readers (column-pruned) and deterministic synthesis.

Reference analogs: ``maybe_load_json`` / ``maybe_load_dataframe``
(/root/reference/s2and/data.py:643-701) become column-pruned
``ray.data.read_parquet`` calls; pickles between stages become Parquet
checkpoints (SURVEY.md §1.4).
"""
