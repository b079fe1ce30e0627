"""Regenerate the "Driver-green history" section of COVERAGE.md.

Reads every CORRECTNESS_r*.json in the repo root and, for each of the 62
SURVEY §2 contract ids, records which rounds the driver graded it green
(rows_match, no err; hash_match too when an oracle exists). The judge's
rotation audit (VERDICT r04 item 8) then needs one table, not three JSONs.

Run from the repo root after each round's CORRECTNESS file lands:
    python tools/gen_coverage_history.py
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
MARKER = "## Driver-green history"


def _history() -> dict[str, dict[int, bool]]:
    hist: dict[str, dict[int, bool]] = {}
    for p in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", Path(p).name).group(1))
        for qid, row in json.load(open(p)).items():
            if row.get("err") == "no_oracle":
                # declared rows-only id: green iff the Spark side ran
                green = row.get("spark_rows") is not None and row["spark_rows"] >= 0
            else:
                green = (
                    row.get("err") is None
                    and bool(row.get("rows_match"))
                    and (row.get("hash_match") is not False)
                )
            hist.setdefault(qid, {})[rnd] = green
    return hist


def render() -> str:
    import sys

    sys.path.insert(0, str(ROOT))
    from distributed_causal_stream_processing_spark.plans.registry import (
        _PROMOTE_AT,
        CONTRACT_ORDER,
        WINDOW_PROMOTED,
    )

    # The driver grades the first 50 registry entries. Derive the graded
    # window exactly as registry._load_all() lays the head out (contract
    # prefix + promoted extras + contract tail), then parked = contract ids
    # not in the window — so a promoted extra displacing a contract id past
    # slot 49 is counted (VERDICT r09 "What's wrong" item 1: the old
    # positions-50+ slice omitted the displaced id).
    head = (
        list(CONTRACT_ORDER[:_PROMOTE_AT])
        + list(WINDOW_PROMOTED)
        + list(CONTRACT_ORDER[_PROMOTE_AT:])
    )
    window = set(head[:50])
    parked = [q for q in CONTRACT_ORDER if q not in window]

    hist = _history()
    rounds = sorted({r for h in hist.values() for r in h})
    lines = [
        MARKER,
        "",
        "Per contract id: which rounds the driver graded it green (✅), red (❌),",
        "or left it outside its ~50-entry grading window (·). Ids outside the",
        "window remain pytest-parity-gated locally every session (tests/test_parity.py).",
        "Regenerate with `python tools/gen_coverage_history.py`.",
        "",
        "Rotation plan (standing): the driver grades the first 50 registry",
        "entries; 62 contract ids exist plus any WINDOW_PROMOTED extras, so",
        f"{len(parked)} ids park this round. Each round's FIRST task swaps the",
        "parked block into the window in `plans/registry.py::CONTRACT_ORDER`",
        "so the block parked last round earns fresh driver rows (never",
        "mid-round — the driver grades end-of-round HEAD). Currently parked",
        "(derived live from the graded window = contract ids minus the first",
        "50 head entries, promoted extras included): "
        + ", ".join(f"`{q}`" for q in parked) + ".",
        "",
        "| query id | " + " | ".join(f"r{r:02d}" for r in rounds) + " | last green |",
        "| --- | " + " | ".join("---" for _ in rounds) + " | --- |",
    ]
    for qid in CONTRACT_ORDER:
        h = hist.get(qid, {})
        cells = [("✅" if h[r] else "❌") if r in h else "·" for r in rounds]
        last = max((r for r, g in h.items() if g), default=None)
        lines.append(
            f"| `{qid}` | " + " | ".join(cells) + f" | {('r%02d' % last) if last else '—'} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    cov = ROOT / "COVERAGE.md"
    text = cov.read_text()
    section = render()
    if MARKER in text:
        head = text.split(MARKER)[0].rstrip() + "\n\n"
    else:
        head = text.rstrip() + "\n\n"
    cov.write_text(head + section)
    print(f"wrote {cov}")


if __name__ == "__main__":
    main()
