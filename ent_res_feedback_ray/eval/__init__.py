"""Evaluation: B³ and pairwise precision/recall/F1 as relational aggregates.

Reference analogs: ``b3_precision_recall_fscore``
(/root/reference/s2and/eval.py:616-720) and
``cluster_precision_recall_fscore`` (/root/reference/s2and/eval.py:723-783).
Golden quadruples from the reference's tests/test_eval.py are
implementation-independent and reused verbatim in tests/test_metrics.py.
"""
