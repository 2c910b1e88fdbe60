"""r16 interim registry edit #3: paired sit-out for the new
``mm_jpeg12_stats`` first-round registration (12-bit extended-sequential
SOF1 decode gate).

``ev_scd2_state_durations`` (green r15, fresh veteran) sits out, its four
SCD2-cluster dependents re-pointed to ``ev_cusum_alarm_minute`` (driver,
r15 first-timer, not touched by the pre-written r17 mapping -- which
re-validates unchanged after this flip).  Surface returns to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"ev_scd2_state_durations": "ev_cusum_alarm_minute"}
REPOINT = {
    "ev_range_interval_join": "ev_cusum_alarm_minute",
    "ev_scd2_user_state": "ev_cusum_alarm_minute",
    "ev_scd2_asof_lookup": "ev_cusum_alarm_minute",
    "ev_cdc_apply_changelog": "ev_cusum_alarm_minute",
}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r16 interim sit-out: paired with the new mm_jpeg12_stats\n"
    "    # first-round registration; re-enters the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r16 sibling re-point: prior anchor sits out for the new\n"
    "    # mm_jpeg12_stats registration.\n"
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
