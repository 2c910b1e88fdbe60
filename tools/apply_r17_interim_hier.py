"""r17 interim registry edit #5: paired sit-out for the new
``mm_jpeg_hier_stats`` first-round registration (hierarchical JPEG
pyramid gate, T.81 Annex J).

``msg_type_taxonomy`` (multi-round green) sits out; it and its two
dependents re-point to ``msg_detail_encrypted_verified``, which runs the
same O22 taxonomy classify inside the full detail pipeline and is
rule-2-protected through the pre-written r18 mapping (which re-validates
unchanged after this flip).  Surface returns to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"msg_type_taxonomy": "msg_detail_encrypted_verified"}
REPOINT = {
    "msg_taxonomy_lookup_join": "msg_detail_encrypted_verified",
    "msg_taxonomy_all_codes": "msg_detail_encrypted_verified",
}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r17 interim sit-out: paired with the new mm_jpeg_hier_stats\n"
    "    # first-round registration; re-enters the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r17 sibling re-point: prior anchor sits out for the new\n"
    "    # mm_jpeg_hier_stats registration.\n"
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
