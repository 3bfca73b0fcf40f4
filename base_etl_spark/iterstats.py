"""Round-count telemetry for the declared-iterative operators.

cluster_kmeans and graph_pagerank converge in a data-dependent number of
rounds; each round is a bounded driver action (k-row centroid collect /
one scalar delta), so WALL TIME scales with round count x per-round plan
cost. tools/scale_stress.py needs the round count to tell "more data per
round" from "more rounds" when judging an amplified-tier ratio — the
operators record their last converged round count here after every run.

Process-local, overwritten per run: telemetry for harnesses, never an
input to any query result.
"""

from __future__ import annotations

ITER_ROUNDS: dict[str, int] = {}


def record(key: str, rounds: int) -> None:
    ITER_ROUNDS[key] = rounds
