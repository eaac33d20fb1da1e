"""Self-maintaining driver-verification order.

The driver walks ``queries()`` in dict order under a ~50-query budget per
round, so the order decides which operators receive a CORRECTNESS row.  Round
7 proved that a hand-rotated static list silently wastes a round when the
rotation is skipped (the 18 never-checked queries sat at positions 51-68 and
the driver re-checked 50 already-green ones).  This module computes the order
at import time from the artifacts the driver itself leaves in the repo root,
so a stale list can no longer exist:

1. **Never driver-checked** queries first — any registry key absent from the
   union of all ``CORRECTNESS_r*.json`` files — cheapest first (per the
   latest ``BENCH_FULL*.json`` timings) so a partial sweep still maximizes
   coverage.
2. **Changed block** — queries whose implementation or oracle changed this
   round (the one genuinely human-known fact, passed in by the caller).
3. **The rest**, stalest driver check first (oldest round, then cheapest),
   so re-check coverage rotates through the registry instead of pinning to
   one prefix.

Name is the frozen final tiebreak everywhere, so the order is deterministic
for a given set of artifacts.
"""

from __future__ import annotations

import json
import math
import os
import re
from collections.abc import Iterable, Sequence

_CORRECTNESS_RE = re.compile(r"^CORRECTNESS_r(\d+)\.json$")
_BENCH_RE = re.compile(r"^BENCH_FULL(?:_r(\d+))?\.json$")


def _load_json(path: str) -> dict | None:
    try:
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
    except (OSError, ValueError):
        return None
    return data if isinstance(data, dict) else None


def last_checked_rounds(repo_root: str) -> dict[str, int]:
    """Map query key -> highest round number with a driver CORRECTNESS row.

    Unreadable or malformed files are skipped (the order must never crash the
    driver's import of ``__spark_entry__``).
    """
    rounds: dict[str, int] = {}
    try:
        names = os.listdir(repo_root)
    except OSError:
        return rounds
    for name in names:
        m = _CORRECTNESS_RE.match(name)
        if not m:
            continue
        data = _load_json(os.path.join(repo_root, name))
        if data is None:
            continue
        rnd = int(m.group(1))
        for key in data:
            if rounds.get(key, -1) < rnd:
                rounds[key] = rnd
    return rounds


def query_costs(repo_root: str) -> dict[str, float]:
    """Map query key -> latest known per-query wall seconds.

    Merges every ``BENCH_FULL*.json`` in round order (later rounds override;
    the un-suffixed ``BENCH_FULL.json`` is oldest).  Costs only order the
    sweep — absolute accuracy does not matter, relative ranking does.
    """
    try:
        names = os.listdir(repo_root)
    except OSError:
        return {}
    matched: list[tuple[int, str]] = []
    for name in names:
        m = _BENCH_RE.match(name)
        if m:
            matched.append((int(m.group(1) or 0), name))
    costs: dict[str, float] = {}
    for _, name in sorted(matched):
        data = _load_json(os.path.join(repo_root, name))
        if data is None:
            continue
        queries = data.get("queries")
        if not isinstance(queries, dict):
            continue
        for key, sec in queries.items():
            if isinstance(sec, (int, float)) and math.isfinite(sec):
                costs[key] = float(sec)
    return costs


def compute_verify_order(
    all_keys: Iterable[str],
    repo_root: str,
    changed: Sequence[str] = (),
) -> list[str]:
    """Return ``all_keys`` reordered for driver verification (see module doc).

    ``changed`` entries that are themselves never-checked stay in the
    never-checked block (it already leads); duplicates and unknown names in
    ``changed`` are ignored.
    """
    keys = list(dict.fromkeys(all_keys))
    known = set(keys)
    rounds = last_checked_rounds(repo_root)
    costs = query_costs(repo_root)

    def cost(k: str) -> float:
        return costs.get(k, math.inf)

    never = sorted((k for k in keys if k not in rounds), key=lambda k: (cost(k), k))
    placed = set(never)
    changed_block = [
        k for k in dict.fromkeys(changed) if k in known and k not in placed
    ]
    placed.update(changed_block)
    rest = sorted(
        (k for k in keys if k not in placed),
        key=lambda k: (rounds.get(k, -1), cost(k), k),
    )
    return never + changed_block + rest
