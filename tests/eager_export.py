"""Independent plain-Python rendering of the nested result export —
the oracle for export.nested_results that does NOT import it (round-2's
frozen golden ran the shared projection, so the nesting/formatting
layer was partially self-checked).

Reimplements, in dict/json.dumps form, the documented export contract
(export.py module docstring): bottom-up relation attachment keyed by
(doc_id, node_path, text, start, end), child arrays sorted by
(text, start, end, probability) with null offsets as -1, root arrays
by (start, end, text), map keys by node name, to_json-style compact
separators with null fields omitted.

Float rendering: Python ``repr`` and JVM ``Double.toString`` both emit
the shortest decimal that round-trips for doubles in [1e-3, 1e7) — the
probability range here is [position_prob^2, 1] — so json.dumps matches
Spark's Jackson output byte-for-byte (asserted corpus-wide by
tests/test_training_export.py's renderer-parity tests).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

# engine.RESULT_COLS order (kept literal here on purpose: the renderer
# must not import uie_pytorch_spark)
COLS = [
    "doc_id", "ex_id", "node_path", "node_name", "text", "start", "end",
    "prob", "is_cls", "parent_path", "parent_text", "parent_start",
    "parent_end", "parent_prob",
]
_I = {c: i for i, c in enumerate(COLS)}


def _nz(v):
    return -1 if v is None else v


def render_doc_json(rows: Sequence[tuple]) -> List[Tuple[int, str]]:
    """Flat RESULT_COLS rows -> sorted [(doc_id, result_json)]."""
    depth = lambda r: r[_I["node_path"]].count("/") + 1  # noqa: E731
    max_depth = max((depth(r) for r in rows), default=1)

    # rel_of: (doc_id, path, text, start, end) -> {child_name: [span]}
    rel_of: Dict[tuple, Dict[str, list]] = {}
    for d in range(max_depth, 1, -1):
        next_rel: Dict[tuple, Dict[str, list]] = {}
        for r in rows:
            if depth(r) != d:
                continue
            span = {
                "text": r[_I["text"]],
                "start": r[_I["start"]],
                "end": r[_I["end"]],
                "probability": r[_I["prob"]],
            }
            sub = rel_of.get(
                (r[_I["doc_id"]], r[_I["node_path"]], r[_I["text"]],
                 r[_I["start"]], r[_I["end"]])
            )
            if sub is not None:
                span["relations"] = sub
            pkey = (
                r[_I["doc_id"]], r[_I["parent_path"]], r[_I["parent_text"]],
                r[_I["parent_start"]], r[_I["parent_end"]],
            )
            next_rel.setdefault(pkey, {}).setdefault(
                r[_I["node_name"]], []
            ).append(span)
        for groups in next_rel.values():
            for spans in groups.values():
                spans.sort(
                    key=lambda s: (
                        s["text"], _nz(s["start"]), _nz(s["end"]),
                        s["probability"],
                    )
                )
        # sort map keys; merge with deeper levels' unattached maps is
        # not needed — each level's parents live exactly one level up
        rel_of = {
            k: {name: g[name] for name in sorted(g)}
            for k, g in next_rel.items()
        }

    docs: Dict[int, Dict[str, list]] = {}
    for r in rows:
        if r[_I["parent_path"]] is not None:
            continue
        span = {
            "text": r[_I["text"]],
            "start": r[_I["start"]],
            "end": r[_I["end"]],
            "probability": r[_I["prob"]],
        }
        sub = rel_of.get(
            (r[_I["doc_id"]], r[_I["node_path"]], r[_I["text"]],
             r[_I["start"]], r[_I["end"]])
        )
        if sub is not None:
            span["relations"] = sub
        docs.setdefault(r[_I["doc_id"]], {}).setdefault(
            r[_I["node_name"]], []
        ).append(span)

    out = []
    for doc_id in sorted(docs):
        res = docs[doc_id]
        for spans in res.values():
            spans.sort(
                key=lambda s: (_nz(s["start"]), _nz(s["end"]), s["text"])
            )
        ordered = {name: res[name] for name in sorted(res)}
        out.append(
            (
                doc_id,
                json.dumps(
                    _drop_nulls(ordered), ensure_ascii=False,
                    separators=(",", ":"),
                ),
            )
        )
    return out


def _drop_nulls(obj):
    """Spark's to_json omits null struct fields (ignoreNullFields)."""
    if isinstance(obj, dict):
        return {k: _drop_nulls(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_drop_nulls(v) for v in obj]
    return obj


def span_rows_from_frozen(frozen_dir: str) -> List[tuple]:
    """Reconstruct the flagship run's flat span rows from the frozen
    uie parquet: roots = uie_entities (the entity-schema run shares the
    flagship's root stage — same prompt, same kernel, so identical
    spans), children = uie_flagship_triples. Lets the nested golden be
    regenerated without re-running eager inference."""
    import pyarrow.parquet as pq

    root_path = "subject entity"
    child_path = "subject entity/related fact"
    rows: List[tuple] = []
    ents = pq.read_table(os.path.join(frozen_dir, "uie_entities.parquet"))
    for r in ents.to_pylist():
        rows.append(
            (r["doc_id"], 0, root_path, r["node_name"], r["text"],
             r["start"], r["end"], r["prob"], False,
             None, None, None, None, None)
        )
    tri = pq.read_table(
        os.path.join(frozen_dir, "uie_flagship_triples.parquet")
    )
    for r in tri.to_pylist():
        rows.append(
            (r["doc_id"], 0, child_path, r["pred"], r["obj_text"],
             r["obj_start"], r["obj_end"], r["obj_prob"], False,
             root_path, r["subj_text"], r["subj_start"], r["subj_end"],
             r["subj_prob"])
        )
    return rows
