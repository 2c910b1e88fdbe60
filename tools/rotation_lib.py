"""Shared machinery for the per-round driver-slot rotation executors.

Each round's ``tools/apply_r{N}_rotation.py`` declares its PROMOTE /
DEMOTE / REPOINT mapping plus the precondition (the prior round's
CORRECTNESS file fully green), and delegates the mechanical work here:

- ``check_correctness_green(round_n, first_timers)`` — the do-NOT-pre-apply
  gate enforced in code since r13;
- ``validate_mapping(...)`` — re-validates a mapping against the LIVE
  registry before any file is touched (names resolve, post-flip driver
  count, sibling edges land on driver=True, no dependent orphaned);
- ``apply(...)`` — the @register-block text rewrite over plans/*.py.

Extracted in r13 (review finding): the rewrite machinery had been
copy-pasted into five per-round executors, so a fix to e.g. the block
regex had to be re-applied to each copy.  Executors for rounds that
already RAN stay as committed artifacts; new rounds import from here.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PLANS = ROOT / "flink_kafka_consumer_cassandra_output_spark" / "plans"


def entry_is_green(v) -> bool:
    """Per-entry green predicate shared by the rotation precondition and
    the staleness audit (ADVICE r13: a red/errored sweep row must NOT
    count as a fresh check).  hash_match is None only for the rows-only
    oracle=None entries, where rows_match is the strongest gate.

    Two recording shapes exist for rows-only entries:

    - the local parity harness records ``rows_match: true, err: null``
      (it still counts rows against the Spark re-run);
    - the DRIVER records ``err: 'no_oracle'`` with every *_match field
      None and only ``spark_rows`` populated (first observed when
      ``msg_detail_encrypted`` took a driver slot in r14; the r14 judge
      adjudicated that shape as the contract's allowed rows-only green).

    Both count as green; any other ``err`` value stays red.
    """
    if not isinstance(v, dict):
        return False
    if v.get("err") == "no_oracle":
        # Driver-side rows-only shape: the query RAN (spark_rows is a
        # real count); there is simply no DuckDB oracle by design.
        # bool is an int subclass: {'spark_rows': true} must NOT count
        # as a real row count (ADVICE r15).
        rows = v.get("spark_rows")
        return isinstance(rows, int) and not isinstance(rows, bool) and rows >= 0
    return (
        bool(v.get("rows_match"))
        and v.get("schema_match") is not False
        and (v.get("hash_match") or v.get("hash_match") is None)
        and not v.get("err")
    )


def check_correctness_green(round_n: int, first_timers: list[str]) -> None:
    """Refuse to proceed unless CORRECTNESS_r{round_n}.json exists, every
    entry is green, and all of ``first_timers`` appear in the sweep."""
    path = ROOT / f"CORRECTNESS_r{round_n:02d}.json"
    if not path.exists():
        raise SystemExit(
            f"PRECONDITION FAILED: {path.name} not present -- do NOT "
            f"pre-apply the r{round_n + 1} rotation before the r{round_n} "
            "surface is externally verified (rounds 9-13 discipline)."
        )
    data = json.loads(path.read_text())
    bad = {n: v for n, v in data.items() if not entry_is_green(v)}
    if bad:
        raise SystemExit(
            f"PRECONDITION FAILED: non-green r{round_n} entries: {sorted(bad)}"
        )
    missing = [n for n in first_timers if n not in data]
    if missing:
        raise SystemExit(
            f"PRECONDITION FAILED: r{round_n} first-timers absent from the "
            f"sweep: {missing}"
        )


def validate_mapping(
    promote: list[str], demote: dict[str, str], repoint: dict[str, str]
) -> None:
    """Validate a promote/demote/re-point mapping against the live registry
    WITHOUT touching any file."""
    import sys

    sys.path.insert(0, str(ROOT))
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    specs = all_specs()
    for name in [*promote, *demote, *demote.values(), *repoint, *repoint.values()]:
        if name not in specs:
            raise SystemExit(f"VALIDATE FAILED: unknown query name {name!r}")
    for name in promote:
        if specs[name].driver:
            raise SystemExit(f"VALIDATE FAILED: promote target {name} already driver")
    for name in demote:
        if not specs[name].driver:
            raise SystemExit(f"VALIDATE FAILED: demote target {name} not driver")
    post_driver = {n for n, s in specs.items() if s.driver}
    post_driver -= set(demote)
    post_driver |= set(promote)
    if len(post_driver) != 50:
        raise SystemExit(f"VALIDATE FAILED: post-flip driver count {len(post_driver)}")
    for src, dst in {**demote, **repoint}.items():
        if dst not in post_driver:
            raise SystemExit(
                f"VALIDATE FAILED: sibling target {dst} (for {src}) not driver post-flip"
            )
    for n, s in specs.items():
        if not s.driver and s.sibling in demote:
            if n not in promote and n not in repoint:
                raise SystemExit(
                    f"VALIDATE FAILED: {n} still points at demoted {s.sibling}"
                )


def _blocks(text: str):
    for m in re.finditer(r"^@register\(\n    \"([a-z0-9_]+)\",", text, re.M):
        close = re.compile(r"^\)\n(?=def |@)", re.M).search(text, m.end())
        yield m.start(), close.end(), m.group(1)


def _rewrite(
    path: Path,
    promote: list[str],
    demote: dict[str, str],
    repoint: dict[str, str],
    promote_comment: str,
    demote_comment: str,
    repoint_comment: str,
) -> bool:
    text = path.read_text()
    out, changed = text, False
    for start, end, name in sorted(_blocks(text), key=lambda t: -t[0]):
        block = out[start:end]
        new = block
        if name in promote:
            lines, keep, buf = new.split("\n"), [], []
            for ln in lines:
                s = ln.strip()
                if s.startswith("#"):
                    buf.append(ln)
                    continue
                if re.match(r"driver=False\b", s) or re.match(r"sibling=", s):
                    buf = []
                    continue
                keep.extend(buf)
                buf = []
                keep.append(ln)
            keep.extend(buf)
            new = "\n".join(keep)
            assert new.endswith(")\n"), name
            new = new[:-2] + promote_comment + ")\n"
        elif name in demote:
            assert new.endswith(")\n"), name
            new = (new[:-2] + demote_comment + "    driver=False,\n"
                   + f'    sibling="{demote[name]}",\n' + ")\n")
        elif name in repoint:
            new2 = re.sub(r'^(    sibling=)"[a-z0-9_]+",$',
                          repoint_comment + rf'\1"{repoint[name]}",',
                          new, count=1, flags=re.M)
            if new2 == new:
                raise SystemExit(f"repoint failed for {name} in {path}")
            new = new2
        if new != block:
            out = out[:start] + new + out[end:]
            changed = True
    if changed:
        path.write_text(out)
    return changed


def apply(
    promote: list[str],
    demote: dict[str, str],
    repoint: dict[str, str],
    promote_comment: str,
    demote_comment: str,
    repoint_comment: str,
) -> None:
    """Run the text rewrite over every plans/*.py, failing loudly if any
    mapped name's @register block was not found."""
    hits = set()
    for path in sorted(PLANS.glob("*.py")):
        for _, _, name in _blocks(path.read_text()):
            if name in promote or name in demote or name in repoint:
                hits.add(name)
        if _rewrite(path, promote, demote, repoint,
                    promote_comment, demote_comment, repoint_comment):
            print("rewrote", path.name)
    want = set(promote) | set(demote) | set(repoint)
    missing = want - hits
    if missing:
        raise SystemExit(f"blocks not found: {sorted(missing)}")
    print("applied; now run registry lint + both parity sweeps before committing")
