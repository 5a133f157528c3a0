"""Pipeline stages: each is a function ``Dataset -> Dataset`` (or a callable
class for actor-pool stages), composable by the pipeline drivers.

Stage kinds (SURVEY.md §7.3):
- stateless ``map_batches`` tasks: normalize, block keys, minhash, pair
  featurize, constraints;
- actor pools (state in ``__init__``): trained scorers, embedders;
- shuffles: block grouping, LSH band grouping, pair dedup, clustering fixpoint.
"""
