"""Trainable pairwise scorer (numpy logistic regression) + AUROC."""

import numpy as np
import pytest

from ent_res_feedback_ray.state.model import LogisticScorer, auroc


def _toy(seed=0, n=400):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    logits = 2.5 * X[:, 0] - 1.5 * X[:, 1]
    y = (logits + 0.3 * rng.normal(size=n) > 0).astype(float)
    return X, y


def test_fit_separates():
    X, y = _toy()
    m = LogisticScorer().fit(X, y)
    p = m.predict_proba(X)
    assert auroc(y, p) > 0.95
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.85


def test_deterministic():
    X, y = _toy()
    m1 = LogisticScorer().fit(X, y)
    m2 = LogisticScorer().fit(X, y)
    assert np.array_equal(m1.w, m2.w)
    assert m1.b == m2.b


def test_nan_fill():
    X, y = _toy()
    X[::7, 1] = np.nan
    m = LogisticScorer(nan_fill=0.0).fit(X, y)
    p = m.predict_proba(X)
    assert np.isfinite(p).all()
    assert auroc(y, p) > 0.85


def test_save_load(tmp_path):
    X, y = _toy()
    m = LogisticScorer().fit(X, y)
    path = str(tmp_path / "model.npz")
    m.save(path)
    m2 = LogisticScorer.load(path)
    assert np.allclose(m.predict_proba(X), m2.predict_proba(X))


def test_auroc_known_values():
    y = np.array([0, 0, 1, 1])
    assert auroc(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert auroc(y, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert auroc(y, np.array([0.5, 0.5, 0.5, 0.5])) == pytest.approx(0.5)


def test_voting_scorer():
    from ent_res_feedback_ray.state.model import VotingScorer

    X, y = _toy()
    m1 = LogisticScorer(seed=1).fit(X, y)
    m2 = LogisticScorer(seed=2, l2=1e-1).fit(X, y)
    ens = VotingScorer([m1, m2])
    p = ens.predict_proba(X)
    expected = (m1.predict_proba(X) + m2.predict_proba(X)) / 2
    assert np.allclose(p, expected)
    assert auroc(y, p) > 0.9


def test_average_precision_goldens():
    """AP goldens (sklearn step-interpolated definition, the reference's
    pairwise_eval AP metric): perfect ranking = 1.0; hand-computed mixed
    case; tied scores enter the threshold sweep together."""
    import numpy as np

    from ent_res_feedback_ray.state.model import average_precision

    # perfect separation
    assert average_precision([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    # sklearn's doc example: y=[0,0,1,1], scores=[0.1,0.4,0.35,0.8] -> 0.8333...
    got = average_precision(np.array([0, 0, 1, 1]),
                            np.array([0.1, 0.4, 0.35, 0.8]))
    assert np.isclose(got, 0.8333333333333333)
    # all scores tied: single threshold group -> AP = prevalence
    assert np.isclose(average_precision([1, 0, 1, 0], [0.5] * 4), 0.5)
    # degenerate: no positives -> nan
    assert np.isnan(average_precision([0, 0], [0.1, 0.2]))


def test_tune_threshold_ratio_objective():
    """metric='ratio' minimizes the mean over/under-merge ratio (reference
    metric_for_hyperopt='ratio'): on a planted instance the perfect
    threshold reaches ratio 1.0 and is selected."""
    import numpy as np
    import pandas as pd

    from ent_res_feedback_ray.state.tuning import tune_score_threshold

    # two gold clusters {0,1,2}, {3,4}; scores separate cleanly at 0.6
    pairs = pd.DataFrame({
        "id1": [0, 0, 1, 3, 0, 1, 2],
        "id2": [1, 2, 2, 4, 3, 4, 4],
        "score": [0.9, 0.8, 0.85, 0.9, 0.2, 0.1, 0.3],
    })
    gold = pd.DataFrame({"node": [0, 1, 2, 3, 4],
                         "gold": [7, 7, 7, 8, 8]})
    th, trials = tune_score_threshold(
        pairs, gold, np.arange(5, dtype=np.int64), metric="ratio")
    assert "merge_ratio" in trials.columns
    best_row = trials.loc[trials["threshold"] == th]
    assert np.isclose(best_row["merge_ratio"].iloc[0], 1.0)
    assert np.isclose(best_row["b3_f1"].iloc[0], 1.0)


def test_logistic_monotone_constraints():
    """monotone=+1 (the LightGBM monotone_constraints analog): all original-
    space weights non-negative, fit quality preserved when the true signal
    is monotone, and the decision function non-decreasing per feature."""
    import numpy as np

    from ent_res_feedback_ray.state.model import LogisticScorer, auroc

    rng = np.random.default_rng(4)
    n = 600
    # true model: y depends positively on f0, f1; f2 is pure noise that an
    # unconstrained fit may weight negatively
    X = rng.random((n, 3))
    z = 3.0 * X[:, 0] + 2.0 * X[:, 1] - 2.5
    y = (z + 0.3 * rng.standard_normal(n) > 0).astype(float)

    m = LogisticScorer(monotone=1, n_iter=400).fit(X, y)
    assert (m.w >= 0).all()
    assert auroc(y, m.predict_proba(X)) > 0.9
    # monotone: increasing any single feature never lowers the score
    probe = rng.random((50, 3))
    bumped = probe.copy()
    bumped[:, 2] += 0.5
    assert (m.decision(bumped) >= m.decision(probe) - 1e-12).all()

    # mixed spec: f2 constrained non-increasing gets w2 <= 0, free fit may not
    m2 = LogisticScorer(monotone=[1, 1, -1], n_iter=400).fit(X, y)
    assert m2.w[0] >= 0 and m2.w[1] >= 0 and m2.w[2] <= 0
