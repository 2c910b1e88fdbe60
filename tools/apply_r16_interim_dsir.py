"""r16 interim registry edit #4: paired sit-out for the new
``doc_dsir_importance`` first-round registration (DSIR hashed-bigram
importance-resampling weights).

``emb_ann_ivf`` (driver-green r15, fresh veteran) sits out; its eight
dependents re-point to ``emb_ann_recall_curve`` -- the ANN-quality
certificate promoted this round, so the ANN family anchor consolidates on
the entry whose freshness the r15 verdict specifically requested.
Neither name appears in the pre-written r17 mapping, which re-validates
unchanged.  Surface returns to 50.
"""
from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PROMOTE: list[str] = []
DEMOTE = {"emb_ann_ivf": "emb_ann_recall_curve"}
REPOINT: dict[str, str] = {}  # filled by validate-time recount below


def _dependents() -> dict[str, str]:
    sys.path.insert(0, str(ROOT))
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    return {
        n: "emb_ann_recall_curve"
        for n, s in all_specs().items()
        if s.sibling == "emb_ann_ivf"
    }


PROMOTE_COMMENT = ""
DEMOTE_COMMENT = (
    "    # r16 interim sit-out: paired with the new doc_dsir_importance\n"
    "    # first-round registration; re-enters the queue at age 1.\n"
)
REPOINT_COMMENT = (
    "    # r16 sibling re-point: prior anchor sits out for the new\n"
    "    # doc_dsir_importance registration.\n"
)


def main() -> None:
    import rotation_lib as lib

    repoint = _dependents()
    lib.validate_mapping(PROMOTE, DEMOTE, repoint)
    if "--validate-only" in sys.argv:
        print(f"mapping valid ({len(repoint)} re-points); no files written")
        return
    lib.apply(PROMOTE, DEMOTE, repoint,
              PROMOTE_COMMENT, DEMOTE_COMMENT, REPOINT_COMMENT)


if __name__ == "__main__":
    sys.path.insert(0, str(ROOT / "tools"))
    main()
