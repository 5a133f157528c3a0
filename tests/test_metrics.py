"""B³ goldens reused verbatim from the reference's implementation-independent
quadruples (/root/reference/tests/test_eval.py:7-38) + pairwise PRF sanity."""

import pandas as pd
import pytest

from ent_res_feedback_ray.eval.metrics import b3_from_dicts, b3_prf, pairwise_prf

GOLD_A = {"dark": [1, 2, 3, 4, 5], "light": [6, 7, 9, 12, 13, 14],
          "line": [8], "purple": [10], "spotted": [11]}


def test_b3_cluster_homogeneity_1():
    pred = {"1": [1, 2, 3, 4], "2": [5, 6, 7], "3": [8, 9, 10, 11, 12, 13, 14]}
    p, r, f = b3_from_dicts(pred, GOLD_A)
    assert round(p, 3) == 0.599
    assert round(r, 3) == 0.695
    assert round(f, 3) == 0.643


def test_b3_cluster_homogeneity_2():
    pred = {"1": [1, 2, 3, 4], "2": [5], "3": [6, 7], "4": [8, 9, 10, 11, 12, 13, 14]}
    p, r, f = b3_from_dicts(pred, GOLD_A)
    assert round(p, 3) == 0.694
    assert round(r, 3) == 0.695
    assert round(f, 3) == 0.695


GOLD_B = {"dark": [1, 2, 3, 4, 5], "light": [6, 7], "line1": [8, 9],
          "line2": [10, 11], "line3": [12, 13]}


def test_b3_size_v_quantity_1():
    pred = {"1": [1, 2, 3, 4, 5], "2": [6], "3": [7], "4": [8], "5": [9],
            "6": [10], "7": [11], "8": [12], "9": [13]}
    p, r, f = b3_from_dicts(pred, GOLD_B)
    assert round(p, 3) == 1
    assert round(r, 3) == 0.692
    assert round(f, 3) == 0.818


def test_b3_size_v_quantity_2():
    pred = {"1": [1, 2, 3, 4], "2": [5], "3": [6, 7], "4": [8, 9],
            "5": [10, 11], "6": [12, 13]}
    p, r, f = b3_from_dicts(pred, GOLD_B)
    assert round(p, 3) == 1
    assert round(r, 3) == 0.877
    assert round(f, 3) == 0.934


def _frames(pred_pairs, gold_pairs):
    pred = pd.DataFrame(pred_pairs, columns=["id", "pred"])
    gold = pd.DataFrame(gold_pairs, columns=["id", "gold"])
    return pred, gold


def test_pairwise_perfect():
    pred, gold = _frames([(1, "a"), (2, "a"), (3, "b")],
                         [(1, "x"), (2, "x"), (3, "y")])
    p, r, f = pairwise_prf(pred, gold)
    assert (p, r, f) == (1.0, 1.0, 1.0)


def test_pairwise_split():
    # gold one cluster of 3 (3 pairs); pred splits into 2+1 (1 pair)
    pred, gold = _frames([(1, "a"), (2, "a"), (3, "b")],
                         [(1, "x"), (2, "x"), (3, "x")])
    p, r, f = pairwise_prf(pred, gold)
    assert p == 1.0
    assert r == pytest.approx(1 / 3)
    assert f == pytest.approx(2 * 1 / (3 + 1))


def test_b3_identical_is_perfect():
    pred, gold = _frames([(i, i % 3) for i in range(30)],
                         [(i, i % 3) for i in range(30)])
    assert b3_prf(pred, gold) == (1.0, 1.0, 1.0)


def test_min_pair_edit_golden():
    """Golden cases for the greedy min-pair-edit repair
    (reference /root/reference/s2and/eval.py:1063-1160)."""
    import pandas as pd

    from ent_res_feedback_ray.eval.metrics import min_pair_edit

    # no wrong pairs → zero edits
    claims = pd.DataFrame({"id1": [1], "id2": [2], "gold_same": [True]})
    assert min_pair_edit(claims, {1: 10, 2: 10}) == (0.0, 0, 0)

    # one record split off its gold cluster: pairs (1,2)+(1,3) same-gold but
    # record 3 sits alone → moving 3 into cluster 10 fixes everything
    claims = pd.DataFrame({
        "id1": [1, 1, 2], "id2": [2, 3, 3],
        "gold_same": [True, True, True]})
    score, steps, n_mistaken = min_pair_edit(
        claims, {1: 10, 2: 10, 3: 99})
    # ids 1, 2, 3 all touch a wrong pair; one move (3 → cluster 10) repairs
    assert steps == 1 and n_mistaken == 3
    assert score == 0.5  # 1 step / (3 − 1)

    # a wrongly-merged record: (1,2) same cluster but different entities →
    # one move to a fresh singleton fixes it
    claims = pd.DataFrame({
        "id1": [1, 1], "id2": [2, 3], "gold_same": [False, True]})
    score, steps, n_mistaken = min_pair_edit(claims, {1: 5, 2: 5, 3: 5})
    assert steps >= 1
    # post-condition: the greedy always terminates with zero wrong pairs on
    # these small instances
    assert n_mistaken >= 1


def test_facet_eval_fifteen_facets(sf_dir):
    """facet_eval covers the reference's facet families (year/author-count/
    block-size/cluster-size analogs + the namesake homonymity/synonymity
    within-block fractions, plus the round-5 additions: first-letter,
    name-length, host-depth, url-scheme, path-depth, tld
    — /root/reference/s2and/eval.py:196-427)."""
    import numpy as np

    from ent_res_feedback_ray.pipelines.er import FACET_COLS, facet_eval

    out = facet_eval(sf_dir)
    assert set(out["facet"]) == set(FACET_COLS)
    assert len(FACET_COLS) == 15
    # per-facet metric rows are finite and within [0, 1]
    for c in ("b3_precision", "b3_recall", "b3_f1"):
        v = out[c].to_numpy(dtype=float)
        assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all()
    # homonymity/synonymity buckets are integer DECILE labels in [0, 10]
    # (half-up floor(x*10 + 0.5) — replayable bit-exact by the SQL twin)
    for facet in ("homonymity_bucket", "synonymity_bucket"):
        vals = out.loc[out["facet"] == facet, "facet_value"].astype(int)
        assert ((vals >= 0) & (vals <= 10)).all()


def test_pairwise_cmacro_matches_reference_semantics():
    """cmacro (per-block pairwise PRF with the Levin singleton fix, averaged
    across blocks) matches a pure-Python replication of the reference
    algorithm (/root/reference/s2and/eval.py:723-868) on a corpus with
    singletons, merged and split clusters."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.eval.metrics import pairwise_cmacro_dataset

    rng = np.random.default_rng(9)
    n = 60
    ids = np.arange(n)
    gold = rng.integers(0, 18, n)          # some singletons
    pred = gold.copy()
    flip = rng.random(n) < 0.25            # perturb: splits + merges
    pred[flip] = rng.integers(18, 30, int(flip.sum()))
    block = rng.integers(0, 5, n)

    pred_ds = ray.data.from_pandas(pd.DataFrame(
        {"id": ids, "pred": pred, "block": block}))
    gold_ds = ray.data.from_pandas(pd.DataFrame({"id": ids, "gold": gold}))
    got = pairwise_cmacro_dataset(pred_ds, gold_ds)

    # pure-python reference replication
    def pairs_of(groups):
        out = set()
        for members in groups.values():
            ms = sorted(members)
            if len(ms) == 1:
                out.add((ms[0], ms[0]))
                continue
            for i in range(len(ms) - 1):
                for j in range(i + 1, len(ms)):
                    out.add((ms[i], ms[j]))
        return out

    mp = mr = mf = 0.0
    blocks = sorted(set(block))
    for b in blocks:
        sel = block == b
        gt, pr = {}, {}
        for i in ids[sel]:
            gt.setdefault(gold[i], []).append(i)
            pr.setdefault(pred[i], []).append(i)
        gp, sp = pairs_of(gt), pairs_of(pr)
        p = len(gp & sp) / len(sp)
        r = len(gp & sp) / len(gp)
        f = 0.0 if p + r == 0 else 2 * p * r / (p + r)
        mp += p; mr += r; mf += f
    k = len(blocks)
    assert got["pair_cmacro_precision"] == round(mp / k, 3)
    assert got["pair_cmacro_recall"] == round(mr / k, 3)
    assert got["pair_cmacro_f1"] == round(mf / k, 3)


def test_b3_skipset_matches_reference_semantics():
    """Skip-set B³ (incremental eval): per-mention values use FULL cluster
    compositions, the mean runs over eval mentions only — parity with a
    pure-Python replication of /root/reference/s2and/eval.py:616-720."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.eval.metrics import b3_skipset_dataset

    rng = np.random.default_rng(11)
    n = 80
    ids = np.arange(n)
    gold = rng.integers(0, 20, n)
    pred = gold.copy()
    flip = rng.random(n) < 0.3
    pred[flip] = rng.integers(20, 35, int(flip.sum()))
    skip = rng.random(n) < 0.4          # "observed" mentions

    got = b3_skipset_dataset(
        ray.data.from_pandas(pd.DataFrame(
            {"id": ids, "pred": pred, "is_eval": ~skip})),
        ray.data.from_pandas(pd.DataFrame({"id": ids, "gold": gold})))

    # reference replication
    pc, gc = {}, {}
    for i in ids:
        pc.setdefault(pred[i], set()).add(i)
        gc.setdefault(gold[i], set()).add(i)
    eval_ids = [i for i in ids if not skip[i]]
    P = R = 0.0
    for i in eval_ids:
        pi, gi = pc[pred[i]], gc[gold[i]]
        inter = len(pi & gi)
        P += inter / len(pi)
        R += inter / len(gi)
    P /= len(eval_ids)
    R /= len(eval_ids)
    F = 0.0 if P + R == 0 else 2 * P * R / (P + R)
    assert got["b3_precision"] == round(P, 3)
    assert got["b3_recall"] == round(R, 3)
    assert got["b3_f1"] == round(F, 3)
    assert got["n_eval"] == len(eval_ids)


def test_over_under_merge_ratios_reference_parity():
    """pred_bigger / true_bigger ratio means match the reference's
    per-mention lists (/root/reference/s2and/eval.py:683-692)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ent_res_feedback_ray.eval.metrics import cluster_metrics_dataset

    rng = np.random.default_rng(13)
    n = 50
    ids = np.arange(n)
    gold = rng.integers(0, 12, n)
    pred = gold.copy()
    flip = rng.random(n) < 0.3
    pred[flip] = rng.integers(12, 20, int(flip.sum()))

    m = cluster_metrics_dataset(
        ray.data.from_pandas(pd.DataFrame({"id": ids, "pred": pred})),
        ray.data.from_pandas(pd.DataFrame({"id": ids, "gold": gold})))

    pc, gc = {}, {}
    for i in ids:
        pc.setdefault(pred[i], set()).add(i)
        gc.setdefault(gold[i], set()).add(i)
    overs, unders = [], []
    for i in ids:
        lp, lg = len(pc[pred[i]]), len(gc[gold[i]])
        (overs if lp >= lg else unders).append(
            lp / lg if lp >= lg else lg / lp)
    assert np.isclose(m["pred_bigger_ratio"], np.mean(overs))
    assert np.isclose(m["true_bigger_ratio"], np.mean(unders))
    assert m["pred_bigger_n"] == len(overs)
    assert m["true_bigger_n"] == len(unders)
