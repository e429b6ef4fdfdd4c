"""Statistical reporting helpers (/root/reference/src/utils.py:126-158).

mean / std / sem / 95% t-interval over repetitions×splits — the aggregation
convention of run_best_ray.py:71-74.
"""

from __future__ import annotations

import numpy as np
import scipy.stats


def mean_confidence_interval(data, confidence: float = 0.95) -> float:
    """t-based half-width of the mean's confidence interval."""
    if len(data) < 2:
        return 0.0
    a = 1.0 * np.array(data)
    n = len(a)
    se = scipy.stats.sem(a)
    return float(se * scipy.stats.t.ppf((1 + confidence) / 2.0, n - 1))


def get_sem(vec) -> float:
    if len(vec) > 1:
        return float(scipy.stats.sem(vec))
    return 0.0


def aggregate_runs(values) -> dict:
    """{mean, std, sem, ci95} summary of a list of metric values."""
    arr = np.asarray(values, np.float64)
    return {
        "mean": float(arr.mean()),
        "std": float(arr.std(ddof=1)) if len(arr) > 1 else 0.0,
        "sem": get_sem(arr),
        "ci95": mean_confidence_interval(arr),
        "n": int(len(arr)),
    }
