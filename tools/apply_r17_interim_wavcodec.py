"""r17 interim registry edit #8: paired sit-out for the new
``mm_wav_codec_stats`` first-round registration (G.711 mu-law/A-law
gate -- the compressed-audio family's first oracle gate; IMA ADPCM
decodes alongside it, reference-simulator-pinned in tests).

``doc_split_assignment`` (multi-round green) sits out; it and its three
dependents re-point to ``doc_k_anonymity``, the sampling/privacy family
anchor on the pre-written r18 mapping's keep list (so the mapping
re-validates unchanged after this flip).  Surface returns to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"doc_split_assignment": "doc_k_anonymity"}
REPOINT = {
    "doc_temperature_mixing": "doc_k_anonymity",
    "doc_weighted_sample": "doc_k_anonymity",
    "ev_zorder_layout": "doc_k_anonymity",
}

PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r17 interim sit-out: paired with the new mm_wav_codec_stats\n"
    "    # first-round registration; re-enters the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r17 sibling re-point: prior anchor sits out for the new\n"
    "    # mm_wav_codec_stats registration.\n"
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
