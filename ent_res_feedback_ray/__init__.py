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

__version__ = "0.2.0"


def _tune_arrow_threads() -> None:
    """Pin Arrow's internal thread pool to 1 inside Ray WORKER processes:
    every worker already owns exactly one Ray CPU slot, so 32 workers × an
    Arrow pool sized to all cores oversubscribes the box 32× on pyarrow
    compute kernels (normalize, sort, take).  The driver keeps Arrow's
    default pool."""
    try:
        import os

        if os.environ.get("RAY_WORKER_RAYLET_ID") or "RAY_RAYLET_PID" in os.environ:
            import pyarrow as _pa

            _pa.set_cpu_count(1)
            _pa.set_io_thread_count(1)
    except Exception:  # pragma: no cover
        pass


def _tune_malloc() -> None:
    """Keep large freed buffers in the malloc arena instead of returning them
    to the OS (glibc mmap's >128KB allocations and munmaps them on free, so
    every fresh numpy temporary re-faults its pages — measured ~300µs/page on
    virtualized hosts, i.e. ~1.2s per 14MB temporary).  Raising
    M_MMAP_THRESHOLD/M_TRIM_THRESHOLD makes batch-sized temporaries reuse
    already-faulted memory; RSS stays bounded by the per-worker peak.

    Runs at import time, so every Ray worker that deserializes this
    package's functions gets the tuning."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platform
        pass


_tune_malloc()
_tune_arrow_threads()
