"""rank-eval metrics (modules/rank-eval in the reference):
precision@k (PrecisionAtK.java), recall@k (RecallAtK.java), MRR
(MeanReciprocalRank.java), DCG/NDCG (DiscountedCumulativeGain.java),
ERR (ExpectedReciprocalRank.java).

Used two ways: as engine API over (query_id, doc_id, rank) result tables +
(query_id, doc_id, grade) judgments, and inside pytest as rank-identity
diagnostics when exact top-k match fails.
"""

from __future__ import annotations

import math


def precision_at_k(ranked: list, relevant: set, k: int) -> float:
    top = ranked[:k]
    if not top:
        return 0.0
    return sum(1 for d in top if d in relevant) / len(top)


def recall_at_k(ranked: list, relevant: set, k: int) -> float:
    if not relevant:
        return 0.0
    return sum(1 for d in ranked[:k] if d in relevant) / len(relevant)


def mrr(ranked: list, relevant: set) -> float:
    for i, d in enumerate(ranked, start=1):
        if d in relevant:
            return 1.0 / i
    return 0.0


def dcg_at_k(ranked: list, grades: dict, k: int) -> float:
    """DCG with the reference's formula: (2^grade - 1) / log2(rank + 1)."""
    return sum(
        (2 ** grades.get(d, 0) - 1) / math.log2(i + 1)
        for i, d in enumerate(ranked[:k], start=1)
    )


def ndcg_at_k(ranked: list, grades: dict, k: int) -> float:
    ideal = sorted(grades.values(), reverse=True)[:k]
    idcg = sum((2**g - 1) / math.log2(i + 1) for i, g in enumerate(ideal, start=1))
    if idcg == 0:
        return 0.0
    return dcg_at_k(ranked, grades, k) / idcg


def err_at_k(ranked: list, grades: dict, k: int, max_grade: int = 3) -> float:
    """Expected reciprocal rank (ExpectedReciprocalRank.java)."""
    p_look = 1.0
    total = 0.0
    for i, d in enumerate(ranked[:k], start=1):
        r = (2 ** grades.get(d, 0) - 1) / (2**max_grade)
        total += p_look * r / i
        p_look *= 1 - r
    return total
