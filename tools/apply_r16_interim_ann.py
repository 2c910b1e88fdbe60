"""r16 interim registry edit (VERDICT r15 task 6): cycle an ANN-quality
certificate back through a driver slot.

``emb_ann_recall_curve`` (IVF probed-search recall vs the exact arm, last
driver-checked r9) takes a slot; ``emb_mmr_diversified_topk`` (green r14/r15,
no dependents) sits out, re-entering the freshness queue at age 1.  The emb
family keeps three driver anchors post-flip (``emb_cosine_topk_arrow``,
``emb_ann_ivf``, ``emb_ann_recall_curve``); the surface stays at 50.

Run AFTER tools/apply_r16_rotation.py; then registry lint + both parity
sweeps before committing (same checklist as the main rotation).
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE = ["emb_ann_recall_curve"]
DEMOTE = {"emb_mmr_diversified_topk": "emb_ann_recall_curve"}
REPOINT: dict[str, str] = {}

PROMOTE_COMMENT = (
    "    # r16 interim promote (VERDICT r15 task 6): ANN recall certificate\n"
    "    # cycles back through a driver slot (last driver-checked r9).\n"
)
DEMOTE_COMMENT = (
    "    # r16 interim sit-out: paired with the emb_ann_recall_curve\n"
    "    # promote (VERDICT r15 task 6); re-enters the queue at age 1.\n"
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
