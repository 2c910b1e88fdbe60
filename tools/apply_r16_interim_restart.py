"""r16 interim registry edit #2: paired sit-out for the new
``mm_jpeg_restart_stats`` first-round registration (restart-interval JPEG
decode gate).

The registration itself lands driver=True in the registry source (new
entries default to a first-round driver slot per the freshness-era lint
rule), pushing the surface to 51; this script demotes
``ev_session_path_trigrams`` (green r15, fresh veteran) back to
local-only, re-pointing its five dependents to the protected stateful
anchor ``ev_max_concurrent_sessions``, restoring the surface to 50.

Chosen over other veterans because it does NOT appear anywhere in the
pre-written r17 mapping (tools/apply_r17_rotation.py): its new sibling is
never demoted at r17 and none of the r17 demote siblings point at it, so
the r17 plan stays valid without edits (re-validated after this flip).
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"ev_session_path_trigrams": "ev_max_concurrent_sessions"}
REPOINT = {
    "ev_json_props_typed": "ev_max_concurrent_sessions",
    "ev_funnel_conversion": "ev_max_concurrent_sessions",
    "ev_event_transitions": "ev_max_concurrent_sessions",
    "ev_ts_pattern_match": "ev_max_concurrent_sessions",
    "ev_conversion_funnel": "ev_max_concurrent_sessions",
}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r16 interim sit-out: paired with the new mm_jpeg_restart_stats\n"
    "    # first-round registration; re-enters the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r16 sibling re-point: prior anchor sits out for the new\n"
    "    # mm_jpeg_restart_stats registration.\n"
)


def main() -> None:
    import rotation_lib as lib

    lib.validate_mapping(PROMOTE, DEMOTE, REPOINT)
    if "--validate-only" in sys.argv:
        print("mapping valid against the live registry; no files written")
        return
    lib.apply(PROMOTE, DEMOTE, REPOINT,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
