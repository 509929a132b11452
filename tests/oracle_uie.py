"""Eager single-process oracle predictor.

This mirrors the reference's multi-stage dataflow
(/root/reference/uie_predictor.py:212-329 BFS, 411-514 single stage,
516-568 join/vote) but runs on the shared in-repo kernel
(uie_pytorch_spark.core) since torch/HF are unavailable in-sandbox.
The Spark engine must reproduce THIS oracle's output exactly
(P/R = 1.0 on the fixture corpus) — the strongest available stand-in
for "matches the reference's emitted triples".

Documented symmetric deviations from the reference (applied on BOTH
sides; see core/spans.py and engine.py docstrings):
  1. span lists are in canonical (start_tok, end_tok) order, not
     CPython set-hash order;
  2. classification-vs-span handling is per result item, not decided
     globally from the first non-empty example of the stage
     (uie_predictor.py:516-527) — identical on the homogeneous stages
     real schemas produce;
  3. pad/special positions can never fire (the reference leaves model
     output on pad positions unmasked).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from uie_pytorch_spark.core.infer import infer_decode_batch
from uie_pytorch_spark.core.model import DEFAULT_SEED, get_model
from uie_pytorch_spark.core.textnorm import (
    cut_chinese_sent,
    dbc2sbc,
    max_predict_len,
    split_windows,
)
from uie_pytorch_spark.schema import SchemaNode, build_tree


def _chunks_with_offsets(text: str, mpl: int, split_sentence: bool):
    """(chunk_text, char_offset) pairs; offsets are cumulative chunk
    lengths (uie_predictor.py:551-565)."""
    pieces = cut_chinese_sent(text) if split_sentence else [text]
    out = []
    off = 0
    for piece in pieces:
        for chunk in split_windows(piece, mpl):
            out.append((chunk, off))
            off += len(chunk)
    return out


def _merge_example(chunk_records: List[List[dict]], chunk_offsets: List[int]):
    """Merge chunk-level records into one example-level result list:
    span items get chunk offsets added; classification items vote
    (count, then summed probability, ties -> first seen; reported
    probability is the mean) per uie_predictor.py:529-550."""
    span_items = []
    vote: Dict[str, list] = {}
    for recs, off in zip(chunk_records, chunk_offsets):
        cls_seen = False
        for r in recs:
            if r["is_cls"]:
                if cls_seen:
                    continue  # reference votes with [0] only
                cls_seen = True
                if r["text"] not in vote:
                    vote[r["text"]] = [1, r["prob"]]
                else:
                    vote[r["text"]][0] += 1
                    vote[r["text"]][1] += r["prob"]
            else:
                span_items.append(
                    {
                        "text": r["text"],
                        "start": r["start"] + off,
                        "end": r["end"] + off,
                        "probability": r["prob"],
                    }
                )
    merged = span_items
    if vote:
        winner, (cnt, sprob) = max(vote.items(), key=lambda kv: kv[1])
        merged = merged + [{"text": winner, "probability": sprob / cnt}]
    return merged


class OracleUIE:
    def __init__(
        self,
        schema,
        seed: int = DEFAULT_SEED,
        max_seq_len: int = 512,
        position_prob: float = 0.5,
        lang: str = "zh",
        split_sentence: bool = False,
        tokenizer: str = "char",
    ):
        self.root = build_tree(schema)
        self.model = get_model(seed)
        self.max_seq_len = max_seq_len
        self.position_prob = position_prob
        self.is_en = lang == "en"
        self.split_sentence = split_sentence
        self.tokenizer = tokenizer

    # -- single stage (uie_predictor.py:411-514) --
    def _single_stage(self, examples: List[dict]) -> List[List[dict]]:
        if not examples:
            return []
        prompts = [e["prompt"] for e in examples]
        mpl = max_predict_len(prompts, self.max_seq_len)

        flat_prompts, flat_chunks = [], []
        spans_per_ex = []
        for e in examples:
            pairs = _chunks_with_offsets(e["text"], mpl, self.split_sentence)
            spans_per_ex.append(pairs)
            flat_prompts.extend([e["prompt"]] * len(pairs))
            flat_chunks.extend([c for c, _ in pairs])

        all_records = infer_decode_batch(
            self.model,
            flat_prompts,
            flat_chunks,
            max_seq_len=self.max_seq_len,
            position_prob=self.position_prob,
            tokenizer=self.tokenizer,
        )
        results = []
        i = 0
        for pairs in spans_per_ex:
            recs = all_records[i : i + len(pairs)]
            i += len(pairs)
            results.append(_merge_example(recs, [off for _, off in pairs]))
        return results

    def _child_prompt(self, node: SchemaNode, parent_text: str) -> str:
        if self.is_en:
            prefix, suffix = node.en_prompt_parts()
            if suffix:
                return dbc2sbc(prefix + " of " + parent_text + suffix)
            return dbc2sbc(node.name + " of " + parent_text)
        return dbc2sbc(parent_text + "的" + node.name)

    # -- multi stage (uie_predictor.py:212-329) --
    def extract(self, texts: List[str]) -> List[dict]:
        results: List[dict] = [{} for _ in texts]
        # per-node state: parent span dicts per doc (mutable, nested)
        queue: List[tuple] = [(child, None) for child in self.root.children]
        while queue:
            node, parent_spans = queue.pop(0)
            examples = []
            owners = []  # (doc_idx, parent_span_dict | None)
            if parent_spans is None:
                for k, text in enumerate(texts):
                    examples.append({"text": text, "prompt": dbc2sbc(node.name)})
                    owners.append((k, None))
            else:
                for k, text in enumerate(texts):
                    for pspan in parent_spans[k]:
                        examples.append(
                            {
                                "text": text,
                                "prompt": self._child_prompt(node, pspan["text"]),
                            }
                        )
                        owners.append((k, pspan))

            result_list = self._single_stage(examples)

            node_spans: List[List[dict]] = [[] for _ in texts]
            for (k, pspan), res in zip(owners, result_list):
                if not res:
                    continue
                if pspan is None:
                    results[k].setdefault(node.name, []).extend(res)
                else:
                    pspan.setdefault("relations", {}).setdefault(
                        node.name, []
                    ).extend(res)
                node_spans[k].extend(res)

            for child in node.children:
                queue.append((child, node_spans))
        return results


# ---- flatteners used by the parity tests ----

def flat_spans(results: List[dict]) -> set:
    """All (doc_idx, node_path, text, start, end, round(prob, 6))."""
    out = set()

    def walk(doc_idx, path, span):
        out.add(
            (
                doc_idx,
                path,
                span["text"],
                span.get("start"),
                span.get("end"),
                round(span["probability"], 6),
            )
        )
        for child_name, child_spans in span.get("relations", {}).items():
            for cs in child_spans:
                walk(doc_idx, f"{path}/{child_name}", cs)

    for doc_idx, res in enumerate(results):
        for name, spans in res.items():
            for s in spans:
                walk(doc_idx, name, s)
    return out


def flat_triples(results: List[dict]) -> set:
    """(doc_idx, subj_text, subj_start, subj_end, pred, obj_text,
    obj_start, obj_end) for every parent->child edge — the north-rule
    P/R matching key (FIXTURES.md §3)."""
    out = set()

    def walk(doc_idx, span):
        for pred, children in span.get("relations", {}).items():
            for c in children:
                out.add(
                    (
                        doc_idx,
                        span["text"],
                        span.get("start"),
                        span.get("end"),
                        pred,
                        c["text"],
                        c.get("start"),
                        c.get("end"),
                    )
                )
                walk(doc_idx, c)

    for doc_idx, res in enumerate(results):
        for _, spans in res.items():
            for s in spans:
                walk(doc_idx, s)
    return out


def golden_sort_key(row):
    doc, path, text, start, end, prob = row
    return (doc, path, -1 if start is None else start,
            -1 if end is None else end, text, prob)
