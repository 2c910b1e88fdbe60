"""Per-query bench trend gate: flag regressions between two bench runs.

Usage:
    python tools/bench_trend.py BASELINE.json CURRENT.json [--write-report]

Each input is a ``bench.py`` output line (the driver's ``BENCH_r{N}.json``
stores the same object under a ``parsed`` key; both shapes are accepted).
Exits nonzero when any query regressed more than ``THRESHOLD`` x, so perf
cannot silently rot between rounds.  ``--write-report`` also writes
``BENCH_TREND.md`` at the repo root.

Noise policy: queries faster than ``MIN_SECONDS`` in BOTH runs are exempt
from the ratio gate (at sub-300ms, scheduler jitter dominates); they are
still listed in the report.
"""

from __future__ import annotations

import json
import os
import re
import sys

THRESHOLD = 1.5
MIN_SECONDS = 0.3


def load_run(path: str) -> tuple[dict[str, float], int]:
    """(per-query timings, timing repeats) from a bench.py output file.

    Accepts four shapes: a raw ``bench.py`` JSON line, the driver's
    ``BENCH_r{N}.json`` with the line under ``parsed``, the driver file
    when ``parsed`` is null but the head-truncated ``tail`` string still
    contains the flat ``"queries": {...}`` object (the r03/r04 files:
    the driver keeps only the last N chars of stdout, cutting the
    ``{"metric"`` prefix so its own parse fails), and the harder
    truncation where the tail starts MID-queries-object (r05: the cut
    also ate ``"queries": {`` and the first entries) -- recovered by
    re-bracing the fragment up to the object's closing ``}``; the lost
    head entries just become absent queries, which compare() reports as
    'added' rather than silently gating on them."""
    with open(path) as f:
        obj = json.load(f)
    if "parsed" in obj and isinstance(obj["parsed"], dict):
        obj = obj["parsed"]
    if "queries" not in obj and isinstance(obj.get("tail"), str):
        tail = obj["tail"]
        r = re.search(r'"repeats": (\d+)', tail)
        m = re.search(r'"queries": (\{[^{}]*\})', tail)
        frag = None
        if m:
            frag = m.group(1)
        else:
            # tail begins inside the queries object: '<name-suffix>": 1.03,
            # "next": ..., "last": 0.5}, "sf": ...'.  Re-brace from the
            # first full entry (the leading truncated one is dropped).
            end = re.search(r"\}", tail)
            start = re.search(r', "', tail)
            if end and start and start.start() < end.start():
                frag = "{" + tail[start.end() - 1 : end.end()]
        if frag:
            queries = json.loads(frag)
            # If the truncation ate the whole queries object, the re-brace
            # lands on the run-metadata suffix ('{"sf": .., "repeats": ..}')
            # -- refuse rather than gate the trend on phantom 'queries'.
            if set(queries) & {"sf", "cpus", "repeats", "n_queries",
                               "n_registered", "value"}:
                raise SystemExit(
                    f"{path}: tail truncated past the queries object; "
                    "unrecoverable bench round"
                )
            obj = {
                "queries": queries,
                "repeats": int(r.group(1)) if r else 1,
            }
    if "queries" not in obj:
        raise SystemExit(f"{path}: no 'queries' key (unparsed bench round?)")
    return dict(obj["queries"]), int(obj.get("repeats", 1))


def compare(base: dict[str, float], cur: dict[str, float]) -> dict:
    """Classify every query: regressed / improved / steady / added / removed."""
    out = {"regressed": {}, "improved": {}, "steady": {}, "added": [], "removed": []}
    for name, t in sorted(cur.items()):
        if name not in base:
            out["added"].append(name)
            continue
        b = base[name]
        ratio = t / b if b > 0 else float("inf")
        entry = {"base": b, "cur": t, "ratio": round(ratio, 2)}
        if ratio > THRESHOLD and max(b, t) >= MIN_SECONDS:
            out["regressed"][name] = entry
        elif ratio < 1 / THRESHOLD and max(b, t) >= MIN_SECONDS:
            out["improved"][name] = entry
        else:
            out["steady"][name] = entry
    out["removed"] = sorted(set(base) - set(cur))
    return out


def report_md(base_path: str, cur_path: str, cmp: dict, methodology_note: str = "") -> str:
    lines = [
        "# BENCH_TREND — per-query regression gate",
        "",
        f"`{os.path.basename(base_path)}` -> `{os.path.basename(cur_path)}`; "
        f"gate: ratio > {THRESHOLD}x on queries >= {MIN_SECONDS}s.",
        "",
    ]
    if methodology_note:
        lines += [f"**{methodology_note}**", ""]
    for title, key in [("Regressions (GATE)", "regressed"), ("Improvements", "improved")]:
        lines.append(f"## {title}\n")
        if not cmp[key]:
            lines.append("none\n")
        else:
            lines.append("| query | base s | current s | ratio |")
            lines.append("|---|---|---|---|")
            for n, e in sorted(cmp[key].items(), key=lambda kv: -kv[1]["ratio"]):
                lines.append(f"| {n} | {e['base']} | {e['cur']} | {e['ratio']}x |")
            lines.append("")
    if cmp["added"]:
        lines.append(f"## New queries\n\n{', '.join(cmp['added'])}\n")
    if cmp["removed"]:
        lines.append(f"## REMOVED queries (investigate)\n\n{', '.join(cmp['removed'])}\n")
    n_steady = len(cmp["steady"])
    lines.append(f"Steady (within {THRESHOLD}x or under noise floor): {n_steady} queries.")
    return "\n".join(lines) + "\n"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    base_path, cur_path = args
    base, base_rep = load_run(base_path)
    cur, cur_rep = load_run(cur_path)
    cmp = compare(base, cur)
    note = ""
    gate = bool(cmp["regressed"])
    if base_rep != cur_rep:
        # Min-of-N vs single-run timings are not comparable: the methodology
        # change alone shifts values more than the gate threshold, masking
        # real regressions and fabricating improvements.  Report ratios for
        # context but DO NOT gate on them; the gate re-arms next round when
        # both sides share a methodology.
        note = (
            f"METHODOLOGY CHANGED (timing repeats {base_rep} -> {cur_rep}): "
            "ratios are apples-to-oranges this round — improvements are "
            "partly measurement artifacts and the regression gate is NOT "
            "armed.  It re-arms when both runs use the same repeats."
        )
        gate = False
    md = report_md(base_path, cur_path, cmp, note)
    if "--write-report" in sys.argv:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH_TREND.md"), "w") as f:
            f.write(md)
    print(md)
    if gate:
        sys.exit(1)


if __name__ == "__main__":
    main()
