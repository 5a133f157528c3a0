"""From-scratch histogram gradient-boosted trees (binary logloss) with
LightGBM-style monotone constraints and native missing-value routing.

Reference analog: the production pairwise scorer is
``lgb.LGBMClassifier(objective="binary", metric="auc", tree_learner="data")``
wrapped by ``PairwiseModeler`` (/root/reference/s2and/model.py:744-876),
hyperopt-tuned over {learning_rate, num_leaves, colsample_bytree, subsample,
min_child_samples, min_child_weight, reg_alpha, reg_lambda, n_estimators,
max_depth} and optionally fit with ``monotone_constraints``
(/root/reference/s2and/model.py:789-799,809).  LightGBM is not available in
this environment, so this is a from-scratch numpy implementation of the same
algorithm family (public knowledge: Ke et al., "LightGBM: A Highly Efficient
Gradient Boosting Decision Tree", NeurIPS 2017; Chen & Guestrin, "XGBoost",
KDD 2016):

- quantile-binned features (≤``max_bins`` bins) built once, uint8 matrix;
- leaf-wise (best-first) growth to ``num_leaves`` with a ``max_depth`` cap —
  LightGBM's growth strategy, vs XGBoost's level-wise;
- per-leaf histograms of (grad, hess, count); the SIBLING histogram is
  derived by subtraction from the parent (LightGBM's halving trick) — only
  the smaller child is scanned;
- second-order gain  ½·[T(GL)²/(HL+λ) + T(GR)²/(HR+λ) − T(G)²/(H+λ)]  with
  L1 soft-thresholding T(g)=sign(g)·max(|g|−α,0) (the XGBoost formulas);
- NaN is a dedicated bin per feature; each split learns the missing
  direction (both routings evaluated, better one kept);
- monotone constraints, LightGBM "basic" method: a split on a constrained
  feature is rejected when the (bound-clipped) child outputs violate the
  required order, and accepted splits tighten the children's output bounds
  to [lb, mid] / [mid, ub] with mid the average of the two child outputs —
  which guarantees ensemble-wide monotonicity, not just per-split;
- deterministic: seeded row/column subsampling, first-max tie-breaking in
  fixed (feature, bin, missing-direction) order.

Training data is bounded by construction (the reference trains on ≤100k
sampled pairs — /root/reference/e2e_scripts/preprocess_s2and_data.py:34-36),
so ``fit`` runs on the driver; inference distributes through the existing
``stages.scoring.TrainedScorer`` actor-pool seam (the model exposes
``predict_proba`` and — having native NaN routing — deliberately does NOT
declare ``nan_fill``, so the stage hands it raw NaNs, matching how the
reference feeds LightGBM unimputed feature matrices).
"""

from __future__ import annotations

import numpy as np

__all__ = ["GBDTScorer", "tune_pairwise_gbdt", "GBDT_SPACE"]


def _soft_threshold(g: np.ndarray | float, alpha: float):
    return np.sign(g) * np.maximum(np.abs(g) - alpha, 0.0)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -36.0, 36.0)))


class _Tree:
    """Flat-array regression tree (one boosting stage)."""

    __slots__ = ("feat", "thr", "miss_left", "left", "right", "value")

    def __init__(self):
        self.feat: list[int] = []       # -1 for leaf
        self.thr: list[float] = []      # raw-value threshold (x <= thr -> left)
        self.miss_left: list[bool] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.value: list[float] = []    # leaf output (already lr-scaled)

    def add_node(self) -> int:
        self.feat.append(-1)
        self.thr.append(0.0)
        self.miss_left.append(True)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(0.0)
        return len(self.feat) - 1

    def arrays(self):
        return (np.asarray(self.feat, np.int32),
                np.asarray(self.thr, np.float64),
                np.asarray(self.miss_left, bool),
                np.asarray(self.left, np.int32),
                np.asarray(self.right, np.int32),
                np.asarray(self.value, np.float64))


def _predict_tree(arrs, X: np.ndarray) -> np.ndarray:
    feat, thr, miss_left, left, right, value = arrs
    n = len(X)
    node = np.zeros(n, np.int32)
    active = feat[node] >= 0
    while active.any():
        idx = np.nonzero(active)[0]
        nd = node[idx]
        f = feat[nd]
        x = X[idx, f]
        go_left = np.where(np.isnan(x), miss_left[nd], x <= thr[nd])
        node[idx] = np.where(go_left, left[nd], right[nd])
        active[idx] = feat[node[idx]] >= 0
    return value[node]


class GBDTScorer:
    """Deterministic histogram GBDT binary classifier (see module docstring).

    Parameters mirror the reference's tuned LightGBM space
    (/root/reference/s2and/model.py:790-800); ``monotone`` is a per-feature
    vector of {+1, 0, -1} (scalar broadcasts), the analog of LightGBM's
    ``monotone_constraints`` string."""

    def __init__(self, n_estimators: int = 64, learning_rate: float = 0.1,
                 num_leaves: int = 31, max_depth: int = -1,
                 min_child_samples: int = 20, min_child_weight: float = 1e-3,
                 reg_alpha: float = 0.0, reg_lambda: float = 1.0,
                 subsample: float = 1.0, colsample_bytree: float = 1.0,
                 max_bins: int = 63, monotone=None, seed: int = 17):
        self.n_estimators = int(n_estimators)
        self.learning_rate = float(learning_rate)
        self.num_leaves = int(num_leaves)
        self.max_depth = int(max_depth)
        self.min_child_samples = int(min_child_samples)
        self.min_child_weight = float(min_child_weight)
        self.reg_alpha = float(reg_alpha)
        self.reg_lambda = float(reg_lambda)
        self.subsample = float(subsample)
        self.colsample_bytree = float(colsample_bytree)
        self.max_bins = int(max_bins)
        self.monotone = monotone
        self.seed = int(seed)
        # fitted state
        self.trees_: list[tuple] = []
        self.base_score_: float = 0.0
        self.n_features_: int = 0

    # ------------------------------------------------------------------ fit
    def _bin_data(self, X: np.ndarray):
        """Quantile edges per feature; bin b ≤ k  ⟺  x ≤ edges[k] (NaN gets
        the dedicated last bin).  Returns (uint8 matrix, list of edges)."""
        n, d = X.shape
        edges_per_feat = []
        Xb = np.empty((n, d), np.uint8)
        for j in range(d):
            col = X[:, j]
            finite = col[~np.isnan(col)]
            if len(finite) == 0:
                edges = np.empty(0, np.float64)
            else:
                qs = np.quantile(finite,
                                 np.linspace(0, 1, self.max_bins + 1)[1:-1])
                edges = np.unique(qs)
            edges_per_feat.append(edges)
            b = np.searchsorted(edges, col, side="left").astype(np.uint8)
            b[np.isnan(col)] = len(edges) + 1  # missing bin
            Xb[:, j] = b
        return Xb, edges_per_feat

    def fit(self, X: np.ndarray, y: np.ndarray,
            sample_weight: np.ndarray | None = None) -> "GBDTScorer":
        X = np.asarray(X, np.float64)
        y = np.asarray(y, np.float64)
        n, d = X.shape
        self.n_features_ = d
        sw = (np.ones(n) if sample_weight is None
              else np.asarray(sample_weight, np.float64))
        mono = np.zeros(d)
        if self.monotone is not None:
            mono = np.broadcast_to(
                np.asarray(self.monotone, np.float64), (d,)).copy()
        rng = np.random.default_rng(self.seed)

        Xb, edges = self._bin_data(X)
        nbin = np.array([len(e) + 2 for e in edges])  # +1 overflow, +1 missing
        B = int(nbin.max())
        miss_bin = nbin - 1  # per-feature missing bin index

        p0 = np.clip((y * sw).sum() / sw.sum(), 1e-6, 1 - 1e-6)
        self.base_score_ = float(np.log(p0 / (1 - p0)))
        raw = np.full(n, self.base_score_)
        self.trees_ = []

        lam, alpha = self.reg_lambda, self.reg_alpha
        lr = self.learning_rate

        def leaf_out(G, H):
            return -_soft_threshold(G, alpha) / (H + lam)

        def score(G, H):
            t = _soft_threshold(G, alpha)
            return t * t / (H + lam)

        for _ in range(self.n_estimators):
            p = _sigmoid(raw)
            g = (p - y) * sw
            h = np.maximum(p * (1 - p), 1e-12) * sw

            if self.subsample < 1.0:
                rows = np.sort(rng.choice(
                    n, size=max(1, int(round(self.subsample * n))),
                    replace=False))
            else:
                rows = np.arange(n)
            if self.colsample_bytree < 1.0:
                feats = np.sort(rng.choice(
                    d, size=max(1, int(round(self.colsample_bytree * d))),
                    replace=False))
            else:
                feats = np.arange(d)

            tree = _Tree()
            root = tree.add_node()

            def build_hist(r):
                """(d, B, 3) grad/hess/count histogram over rows r."""
                hist = np.zeros((d, B, 3))
                gr, hr = g[r], h[r]
                for j in feats:
                    bj = Xb[r, j]
                    hist[j, :, 0] = np.bincount(bj, weights=gr, minlength=B)
                    hist[j, :, 1] = np.bincount(bj, weights=hr, minlength=B)
                    hist[j, :, 2] = np.bincount(bj, minlength=B)
                return hist

            # leaf registry: id -> (node, rows, hist, G, H, depth, lb, ub)
            leaves = {}
            r0 = rows
            h0 = build_hist(r0)
            leaves[root] = (root, r0, h0, g[r0].sum(), h[r0].sum(), 0,
                            -np.inf, np.inf)

            def best_split(leaf):
                node, r, hist, G, H, depth, lb, ub = leaf
                if (len(r) < 2 * self.min_child_samples
                        or (0 < self.max_depth <= depth)):
                    return None
                parent = score(G, H)
                best = None  # (gain, j, k, miss_left, outl, outr)
                for j in feats:
                    e = edges[j]
                    if len(e) == 0:
                        continue
                    mb = miss_bin[j]
                    hj = hist[j]
                    Gm, Hm, Cm = hj[mb]
                    # cumulative over non-missing bins 0..mb-1; candidate
                    # split bins k = 0..mb-2 ("bin <= k goes left")
                    cg = np.cumsum(hj[:mb, 0])[:-1]
                    ch = np.cumsum(hj[:mb, 1])[:-1]
                    cc = np.cumsum(hj[:mb, 2])[:-1]
                    ncand = min(len(cg), len(e))
                    if ncand <= 0:
                        continue
                    cg, ch, cc = cg[:ncand], ch[:ncand], cc[:ncand]
                    for miss_left_flag in (True, False) if Cm > 0 else (True,):
                        GL = cg + (Gm if miss_left_flag else 0.0)
                        HL = ch + (Hm if miss_left_flag else 0.0)
                        CL = cc + (Cm if miss_left_flag else 0.0)
                        GR, HR, CR = G - GL, H - HL, len(r) - CL
                        ok = ((CL >= self.min_child_samples)
                              & (CR >= self.min_child_samples)
                              & (HL >= self.min_child_weight)
                              & (HR >= self.min_child_weight))
                        if not ok.any():
                            continue
                        gain = 0.5 * (score(GL, HL) + score(GR, HR) - parent)
                        outl = np.clip(leaf_out(GL, HL), lb, ub)
                        outr = np.clip(leaf_out(GR, HR), lb, ub)
                        if mono[j] > 0:
                            ok &= outl <= outr
                        elif mono[j] < 0:
                            ok &= outl >= outr
                        gain = np.where(ok, gain, -np.inf)
                        k = int(np.argmax(gain))
                        if gain[k] > 0 and (best is None or gain[k] > best[0]):
                            best = (float(gain[k]), int(j), k,
                                    miss_left_flag,
                                    float(outl[k]), float(outr[k]))
                return best

            cand = {root: best_split(leaves[root])}
            n_leaves = 1
            while n_leaves < self.num_leaves:
                live = [(lid, c) for lid, c in cand.items() if c is not None]
                if not live:
                    break
                lid, (gain, j, k, mleft, outl, outr) = max(
                    live, key=lambda t: (t[1][0], -t[0]))
                node, r, hist, G, H, depth, lb, ub = leaves.pop(lid)
                del cand[lid]

                bj = Xb[r, j]
                go_left = bj <= k
                if mleft:
                    go_left |= bj == miss_bin[j]
                rl, rr = r[go_left], r[~go_left]
                # sibling-subtraction: scan only the smaller child
                if len(rl) <= len(rr):
                    hl = build_hist(rl)
                    hr = hist - hl
                else:
                    hr = build_hist(rr)
                    hl = hist - hr

                if mono[j] != 0:
                    mid = 0.5 * (outl + outr)
                    if mono[j] > 0:
                        bl, bu = (lb, mid), (mid, ub)
                    else:
                        bl, bu = (mid, ub), (lb, mid)
                else:
                    bl = bu = (lb, ub)

                nl, nr = tree.add_node(), tree.add_node()
                tree.feat[node] = j
                tree.thr[node] = float(edges[j][k])
                tree.miss_left[node] = bool(mleft)
                tree.left[node], tree.right[node] = nl, nr

                leaves[nl] = (nl, rl, hl, g[rl].sum(), h[rl].sum(),
                              depth + 1, *bl)
                leaves[nr] = (nr, rr, hr, g[rr].sum(), h[rr].sum(),
                              depth + 1, *bu)
                cand[nl] = best_split(leaves[nl])
                cand[nr] = best_split(leaves[nr])
                n_leaves += 1

            # finalize leaf values and update raw scores
            for lid, (node, r, _hist, G, H, _dep, lb, ub) in leaves.items():
                v = lr * float(np.clip(leaf_out(G, H), lb, ub))
                tree.value[node] = v
                raw[r] += v
            self.trees_.append(tree.arrays())
        return self

    # ------------------------------------------------------------- predict
    def decision(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, np.float64)
        out = np.full(len(X), self.base_score_)
        for arrs in self.trees_:
            out += _predict_tree(arrs, X)
        return out

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return _sigmoid(self.decision(X))

    # --------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        """Flat-array npz (no pickle): per-tree arrays concatenated with
        offsets — the round-checkpoint format of ``state.model``."""
        if not path.endswith(".npz"):
            path += ".npz"
        offs = np.cumsum([0] + [len(t[0]) for t in self.trees_])
        cat = (lambda i, dt: np.concatenate(
            [t[i] for t in self.trees_]).astype(dt)
            if self.trees_ else np.empty(0, dt))
        np.savez(path, feat=cat(0, np.int32), thr=cat(1, np.float64),
                 miss=cat(2, bool), left=cat(3, np.int32),
                 right=cat(4, np.int32), value=cat(5, np.float64),
                 offsets=offs.astype(np.int64),
                 base_score=np.float64(self.base_score_),
                 n_features=np.int64(self.n_features_))

    @classmethod
    def load(cls, path: str) -> "GBDTScorer":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        m = cls()
        m.base_score_ = float(data["base_score"])
        m.n_features_ = int(data["n_features"])
        offs = data["offsets"]
        m.trees_ = []
        for a, b in zip(offs[:-1], offs[1:]):
            m.trees_.append((data["feat"][a:b], data["thr"][a:b],
                             data["miss"][a:b], data["left"][a:b],
                             data["right"][a:b], data["value"][a:b]))
        return m


# The reference's hyperopt space (/root/reference/s2and/model.py:790-800),
# re-expressed for state.tpe.TPESearch at sandbox-scale budgets (the
# reference tunes n_estimators in [1000, 2500] against 100k pairs on 16
# cores; trials here must stay seconds-cheap).
GBDT_SPACE = {
    # log-space bounds, like hp.loguniform (see state.tpe docstring)
    "learning_rate": ("loguniform", -3.9, -0.7),       # ~[0.02, 0.5]
    "num_leaves": ("qloguniform", 1.386, 4.159, 1.0),  # ~[4, 64]
    "min_child_samples": ("qloguniform", 1.609, 4.605, 1.0),  # ~[5, 100]
    "reg_lambda": ("loguniform", -6.9, 2.3),           # ~[1e-3, 10]
    "n_estimators": ("quniform", 16.0, 96.0, 8.0),
    "subsample": ("uniform", 0.5, 1.0),
    "colsample_bytree": ("uniform", 0.5, 1.0),
}


def tune_pairwise_gbdt(X_train, y_train, X_val, y_val, space=None,
                       n_iter: int = 12, batch: int = 4, seed: int = 17,
                       monotone=None, gamma: float = 0.25):
    """TPE-tuned :class:`GBDTScorer` — the exact shape of the reference's
    ``PairwiseModeler.fit`` (/root/reference/s2and/model.py:819-871):
    minimize −AUROC(val) over the LightGBM space, refit the winner on train
    only.  Trials run as Ray tasks over ray.put-once matrices (see
    ``state.tpe.tune_pairwise_model``)."""
    import ray

    from .model import auroc
    from .tpe import TPESearch

    space = GBDT_SPACE if space is None else space
    tpe = TPESearch(space, seed=seed, gamma=gamma)
    refs = [ray.put(np.ascontiguousarray(a, dtype=np.float64))
            for a in (X_train, y_train, X_val, y_val)]

    @ray.remote(num_cpus=1)
    def _trial(params, Xtr, ytr, Xv, yv):
        m = GBDTScorer(monotone=monotone, seed=seed, **{
            k: (int(v) if k in ("num_leaves", "min_child_samples",
                                "n_estimators", "max_depth") else float(v))
            for k, v in params.items()})
        m.fit(Xtr, ytr)
        a = auroc(yv, m.predict_proba(Xv))
        return -(a if np.isfinite(a) else 0.0)

    done = 0
    while done < n_iter:
        props = tpe.suggest(min(batch, n_iter - done))
        losses = ray.get([_trial.remote(p, *refs) for p in props])
        for p, l in zip(props, losses):
            tpe.observe(p, l)
        done += len(props)

    best = tpe.best_params
    model = GBDTScorer(monotone=monotone, seed=seed, **{
        k: (int(v) if k in ("num_leaves", "min_child_samples",
                            "n_estimators", "max_depth") else float(v))
        for k, v in best.items()})
    model.fit(np.asarray(X_train, np.float64),
              np.asarray(y_train, np.float64))
    return model, tpe
