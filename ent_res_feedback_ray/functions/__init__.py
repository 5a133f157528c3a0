"""Pure, vectorized kernels used inside ``map_batches`` stages.

These are the scalar/array functions of the engine (string similarity,
normalization, hashing/sketching).  None of them distributes on its own;
they are the per-batch compute bodies.  Reference analogs live in
``/root/reference/s2and/text.py`` (see each module's docstring).
"""
