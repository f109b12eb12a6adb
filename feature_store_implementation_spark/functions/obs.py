"""Bounded reads of ``pyspark.sql.Observation`` metrics.

``Observation.get`` waits on the JVM promise with NO timeout: when the
observed plan's CollectMetrics node never materializes for the action
that was supposed to fill it (folded LocalRelation plans are the known
case; an optimizer rewrite dropping the node is the hypothetical one),
the caller hangs forever instead of reaching its documented fallback
(ADVICE r12). Every metrics-ride-the-write call site goes through
:func:`observed_metrics` instead: a bounded wait that returns ``None``
on timeout OR conversion failure, so callers always reach their
dedicated-aggregation fallback — correctness over speed, boundedly.
"""

from __future__ import annotations

import threading


def observed_metrics(obs, timeout: float = 60.0) -> dict | None:
    """Return ``obs.get`` as a dict, or ``None`` if the metrics are not
    available within ``timeout`` seconds or their row conversion fails.

    The wait runs on a daemon thread so a pathological never-resolving
    JVM promise costs one leaked (process-lifetime-bounded) thread, not
    a hung pipeline. Call this ONLY after the observed DataFrame's
    action has run — the timeout is a safety bound, not a scheduler."""
    box: dict = {}

    def _read() -> None:
        try:
            box["m"] = dict(obs.get)
        except Exception:
            box["m"] = None

    t = threading.Thread(target=_read, daemon=True, name="observation-get")
    t.start()
    t.join(timeout)
    return box.get("m")
