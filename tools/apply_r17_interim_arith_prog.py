"""r17 interim registry edit #6: paired sit-out for the new
``mm_jpeg_arith_prog_stats`` first-round registration (arithmetic-coded
progressive SOF10 gate, completing the JPEG coding-process matrix).

``doc_token_lift`` (multi-round green) sits out; it and its three
dependents re-point to ``doc_zipf_fit``, the token-frequency family's
kept driver anchor (on the pre-written r18 mapping's keep list, so the
mapping re-validates unchanged after this flip).  Surface returns
to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"doc_token_lift": "doc_zipf_fit"}
REPOINT = {
    "doc_lm_rarity": "doc_zipf_fit",
    "doc_bm25_topk": "doc_zipf_fit",
    "doc_ngram_topk": "doc_zipf_fit",
}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r17 interim sit-out: paired with the new\n"
    "    # mm_jpeg_arith_prog_stats first-round registration; re-enters\n"
    "    # the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r17 sibling re-point: prior anchor sits out for the new\n"
    "    # mm_jpeg_arith_prog_stats registration.\n"
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
