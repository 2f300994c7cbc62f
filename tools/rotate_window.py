"""Deterministic driver-window rotation (round-4 verdict, Next #1).

The driver gate evaluates the FIRST 50 entries of ``datax_spark.suite._QUERIES``
against their DuckDB oracles each round.  Policy (oldest-evidence-first):

1. never-driver-gated queries first (new additions this round),
2. then ascending by the round of their latest fully-green driver row
   (rows_match AND hash_match AND no err in CORRECTNESS_r{N}.json),
3. stable within a cohort (current registry order preserved).

This guarantees no query's driver evidence ever ages past ~2 rounds: the
50-slot window always swallows every cohort older than the freshest one
before touching fresher rows.

Usage: ``python tools/rotate_window.py`` from the repo root — prints the
rotated ``_QUERIES`` body (one ``"name": q_func,`` line per entry, cohort
comments included) for manual paste into ``datax_spark/suite.py``.
"""

from __future__ import annotations

import glob
import json
import re


def latest_green_round(root: str = ".") -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(f"{root}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if row.get("rows_match") and row.get("hash_match") and not row.get("err"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def registry_names(suite_path: str = "datax_spark/suite.py") -> list[tuple[str, str]]:
    src = open(suite_path).read()
    m = re.search(r"_QUERIES: dict\[str, Callable.*?\] = \{(.*?)\n\}", src, re.S)
    return re.findall(r'"([a-z0-9_]+)":\s*([a-zA-Z0-9_]+),', m.group(1))


def rotated(window: int = 50) -> list[tuple[str, str, int]]:
    last = latest_green_round()
    entries = registry_names()
    order = sorted(
        range(len(entries)),
        key=lambda i: (last.get(entries[i][0], 0), i),
    )
    return [(entries[i][0], entries[i][1], last.get(entries[i][0], 0)) for i in order]


def main() -> None:
    rows = rotated()
    prev = None
    for idx, (name, func, rnd) in enumerate(rows):
        if rnd != prev:
            label = "never driver-gated (new this round)" if rnd == 0 else f"latest driver-green row: r{rnd}"
            print(f"    # ---- {label} ----")
            prev = rnd
        marker = "  # ← gate window boundary (first 50)" if idx == 49 else ""
        print(f'    "{name}": {func},{marker}')


if __name__ == "__main__":
    main()
