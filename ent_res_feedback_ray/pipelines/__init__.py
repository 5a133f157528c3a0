"""End-to-end pipelines: composed stage graphs, runnable per scale-factor dir.

``er`` — the flagship entity-resolution path (normalize → block → pairs →
features → score → constraints → transitive clustering → eval).
``relational`` — the general query-engine surface (aggregates, joins,
windows, top-k) over the star schema.
``feedback`` — checkpointed active-learning rounds (reference ``simulate``
loop, /root/reference/ecc/ecc.py:787-900).
``protocol`` — the formal Stage extension surface: a registry of
``(Dataset, Ctx) -> Dataset`` stages + ``build_pipeline(config)`` so
blocking/scoring/clustering variants are config edits.
"""
