"""r17 interim registry edit #7: paired sit-out for the new
``mm_jpeg_lossless_stats`` first-round registration (SOF3 predictive
lossless gate -- the JPEG coding-process matrix now covers every T.81
Table B.1 process except arithmetic lossless and the differential-
lossless hierarchical frames).

``doc_phrase_search`` (multi-round green) sits out; it and its three
dependents re-point to ``doc_char_kl_gibberish``, the n-gram-statistics
family anchor on the pre-written r18 mapping's keep list (so the
mapping re-validates unchanged after this flip).  Surface returns
to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"doc_phrase_search": "doc_char_kl_gibberish"}
REPOINT = {
    "doc_repeated_passages": "doc_char_kl_gibberish",
    "doc_decontamination_ngram": "doc_char_kl_gibberish",
    "doc_decontamination_bloom": "doc_char_kl_gibberish",
}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r17 interim sit-out: paired with the new\n"
    "    # mm_jpeg_lossless_stats first-round registration; re-enters\n"
    "    # the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r17 sibling re-point: prior anchor sits out for the new\n"
    "    # mm_jpeg_lossless_stats registration.\n"
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
