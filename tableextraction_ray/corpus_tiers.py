"""Corpus tier resolution shared by the driver contract (``__ray_entry__``)
and the DuckDB oracle catalog (``tableextraction_ray.oracles``).

The extraction pipeline runs on the FIXTURES.md synthetic interleaved
corpus (the BASELINE.json input_hint shape), synthesized deterministically
per scale tier and cached under /tmp.
"""

from __future__ import annotations

import os

SF_TO_TIER = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}

#: Media-store directory the DuckDB media oracles read. The driver contract
#: runs oracles side-by-side with Ray queries at sf=0.01 only, so the
#: oracle path resolves that sf's tier via the same mapping corpus_for
#: uses — one source of truth, no hardcoded literal.
ORACLE_CORPUS_DIR = f"/tmp/graft_corpus/{SF_TO_TIER['sf0.01']}"

#: Memorization-probe strings for canary_scan — substrings known to occur
#: in the synthetic corpus vocabulary (and one per-bigram rarity gradient),
#: kept in one place so the Ray call and the oracle VALUES list stay in
#: sync.
CANARIES: tuple[str, ...] = (
    "spark window",
    "batch batch batch",
    "customer filter",
)


def corpus_for(sf_dir: str) -> str:
    from tableextraction_ray.datagen import generate_corpus

    tier = SF_TO_TIER.get(os.path.basename(os.path.normpath(sf_dir)), "t1")
    return generate_corpus(f"/tmp/graft_corpus/{tier}", tier=tier)
