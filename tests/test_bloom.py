"""Bloom membership sketch (bounded-state seen-set gate for streaming
ingest; complements the exact frozen fingerprint store and the HLL /
Misra-Gries sketches).

Pins: ZERO false negatives (the property the novelty gate relies on),
empirical FPR within 3x the configured target, distributed build ==
driver build bit-for-bit, and the ingest-gate split semantics."""

import numpy as np
import pandas as pd
import ray.data

from ent_res_feedback_ray.stages.dedup import (
    BloomFilter, bloom_build, bloom_novelty_split)


def test_bloom_no_false_negatives_and_fpr():
    rng = np.random.default_rng(1)
    seen = [f"url-{i}" for i in range(5000)]
    bf = BloomFilter.for_capacity(5000, fpr=0.01)
    bf.add(seen)
    assert bf.contains(seen).all()          # no false negatives, ever
    fresh = [f"new-{i}" for i in range(20000)]
    fp = bf.contains(fresh).mean()
    assert fp < 0.03, fp                    # 3x the 1% target
    assert 0.3 < bf.fill_ratio() < 0.7      # sized near the optimum


def test_bloom_distributed_build_matches_driver(sf_dir):
    df = pd.DataFrame({"url": [f"https://h{i % 97}.com/p{i}"
                               for i in range(4000)]})
    ds = ray.data.from_pandas(df).repartition(8)
    dist = bloom_build(ds, "url", capacity=4000, fpr=0.02)
    local = BloomFilter.for_capacity(4000, fpr=0.02)
    local.add(df["url"].tolist())
    assert np.array_equal(dist.bits, local.bits)
    assert (dist.n_bits, dist.k) == (local.n_bits, local.k)


def test_bloom_novelty_split_gate(sf_dir):
    old = pd.DataFrame({"url": [f"u{i}" for i in range(2000)]})
    bf = bloom_build(ray.data.from_pandas(old), "url", capacity=2000)
    new = pd.DataFrame({"url": [f"u{i}" for i in range(1990, 2010)]})
    out = (bloom_novelty_split(ray.data.from_pandas(new), "url", bf)
           .to_pandas().set_index("url"))
    # every truly-seen url is flagged maybe-seen (no false negatives);
    # the split is what routes rows to the exact incremental-dedup check
    assert (~out.loc[[f"u{i}" for i in range(1990, 2000)],
                     "definitely_new"]).all()
    assert out["definitely_new"].dtype == bool
