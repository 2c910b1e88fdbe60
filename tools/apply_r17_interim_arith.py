"""r17 interim registry edit #4: paired sit-out for the new
``mm_jpeg_arith_stats`` first-round registration (arithmetic-coded SOF9
decode gate, T.81 Annex D QM-coder + Annex F statistical models).

``mm_jpeg_420_stats`` (green since r15, zero dependents, untouched by
the pre-written r18 mapping -- which re-validates unchanged after this
flip) sits out, anchored to the new gate.  Surface returns to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"mm_jpeg_420_stats": "mm_jpeg_arith_stats"}
REPOINT: dict[str, str] = {}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r17 interim sit-out: paired with the new mm_jpeg_arith_stats\n"
    "    # first-round registration; re-enters the queue at age 1.\n"
)
REPOINT_COMMENT = ""


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
