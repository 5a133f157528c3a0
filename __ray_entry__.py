"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship ER pipeline at sf0.001.
``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins (omitted for non-SQL-expressible ops).

Ray is initialised by the driver BEFORE importing this module; nothing here
calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: blocked ER over the derived pages table at sf0.001 —
    normalize → block → pairs → featurize → score → constraints →
    transitive clustering.  Returns the (doc_id, cluster_id) assignments."""
    from ent_res_feedback_ray.pipelines import er

    return er.clusters(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from ent_res_feedback_ray.pipelines import er

    q: dict[str, Callable[[str], Any]] = {
        # --- entity resolution (SURVEY.md §2.2/§2.5/§2.7/§2.10) ---
        "er_pages": er.load_pages,
        "er_normalize": lambda sf: er.pages_normalized(sf).select_columns(
            ["doc_id", "url", "norm_text"]),
        "er_blocking": er.blocked_compact,
        "er_candidate_pairs": er.candidate_pairs_compact,
        "er_features": er.pair_features,
        "er_scores": er.scored_pairs_compact,
        "er_clusters": er.clusters,
        "er_uncertain_topk": er.uncertain_topk,
        "er_quality": er.er_quality,
    }
    return q


def oracle_sql() -> dict[str, str]:
    from ent_res_feedback_ray.pipelines import er

    return dict(er.oracle_queries())
