"""ent_res_feedback_ray — a Ray-Data-native entity-resolution / data-processing engine.

A from-scratch rebuild of the capabilities of ``iesl/ent-res-feedback``
(blocking → pairwise scoring → constrained transitive clustering → feedback
rounds → B³ / pairwise-F1 evaluation), re-expressed as Ray Data pipelines:

- every per-record transform is a vectorized ``map_batches`` over Arrow batches;
- stateful stages (scorers, embedders) are actor pools (state in ``__init__``);
- wide steps (blocking, LSH bands, pair dedup, clustering fixpoint) are
  ``groupby`` shuffles with explicit skew handling;
- everything streams — no full materialization on the driver.

Reference semantics are cited per-module as ``/root/reference/<file>:<lines>``;
no reference code is copied (the reference is a single-node multiprocessing
engine; this is an idiomatic Ray Data design).
"""

__version__ = "0.1.0"
