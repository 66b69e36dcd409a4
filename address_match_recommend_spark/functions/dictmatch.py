"""Dictionary (trie) matching — the reference's J4/C5 as a broadcast UDF.

The reference interprets addresses by walking a character trie of ~47,767
region names/aliases (longest-prefix, deep-most match with disambiguation:
/root/reference/index/term_index_builder.go:95-137,
index/term_index_entry.go:23-38, visitor region_interpreter_visitor.go),
the trie built once at startup from the region tree with aliases ordered
longest-first (/root/reference/models/region.go:53-87).

Transcripts have their own dictionaries: tool names, model names, product
terms, known entities. This module provides the same capability Spark-
first: the dictionary is a **driver-built trie broadcast to executors**
(the distributed analog of the reference's process-global trie) and
matching runs inside an Arrow-batched ``mapInPandas`` — dictionary match
is not expressible as a relational join without exploding every substring,
which is exactly why the reference used a trie (SURVEY §2.3 J4).

Matching semantics mirror the reference: scan left to right, at each
position take the LONGEST dictionary entry that matches (longest-first
preference, reference models/region.go:53-87 T5), consume it, continue
after its end; unmatched characters are skipped. Case-insensitive.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


class Trie:
    """Minimal character trie with longest-match lookup (the reference's
    TermIndexEntry: Key/Items/Children map,
    /root/reference/index/term_index_entry.go:8-38). A terminal node may
    carry MULTIPLE payload items (the reference's ``Items []*TermIndexItem``
    — one per region sharing the name); disambiguation happens at lookup
    time (see :func:`extract_hierarchical_terms`)."""

    __slots__ = ("children", "payload", "terminal")

    def __init__(self) -> None:
        self.children: dict[str, Trie] = {}
        self.payload = None
        self.terminal = False

    def insert(self, key: str, payload=None) -> None:
        node = self
        for ch in key:
            node = node.children.setdefault(ch, Trie())
        node.terminal = True
        node.payload = payload

    def insert_item(self, key: str, item) -> None:
        """Append ``item`` to the key's payload list (multi-item entry)."""
        node = self
        for ch in key:
            node = node.children.setdefault(ch, Trie())
        node.terminal = True
        if node.payload is None:
            node.payload = []
        node.payload.append(item)

    def longest_match(self, text: str, start: int) -> tuple[int, object] | None:
        """(end_exclusive, payload) of the longest entry matching
        ``text[start:]``, or None."""
        node, best = self, None
        i = start
        while i < len(text):
            node = node.children.get(text[i])
            if node is None:
                break
            i += 1
            if node.terminal:
                best = (i, node.payload)
        return best


def build_trie(entries: dict[str, object] | list[str]) -> Trie:
    trie = Trie()
    if isinstance(entries, dict):
        for k, v in entries.items():
            trie.insert(k.lower(), v)
    else:
        for k in entries:
            trie.insert(k.lower(), k)
    return trie


def extract_dictionary_terms(
    df: DataFrame,
    dictionary: dict[str, object] | list[str],
    text_col: str = "canonical_text",
    id_col: str = "conv_id",
) -> DataFrame:
    """(id, term, label, pos) — every longest-match dictionary hit per row.

    The trie is broadcast ONCE (sc.broadcast) and deserialized per
    executor, not per batch — the distributed twin of the reference's
    startup-built index. Matching is per-batch Python over Arrow batches;
    the dictionary path is opt-in (the default pipeline doesn't need it),
    mirroring SURVEY §2.11's 'only if dictionary blocking is enabled'.
    """
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(build_trie(dictionary))

    def match(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trie = bc.value
        for pdf in batches:
            out_id, out_term, out_label, out_pos = [], [], [], []
            for rid, text in zip(pdf["id"], pdf["text"]):
                low = (text or "").lower()
                i = 0
                while i < len(low):
                    hit = trie.longest_match(low, i)
                    if hit is None:
                        i += 1
                        continue
                    end, payload = hit
                    out_id.append(rid)
                    out_term.append(low[i:end])
                    out_label.append(str(payload))
                    out_pos.append(i)
                    i = end
            yield pd.DataFrame(
                {"id": out_id, "term": out_term, "label": out_label, "pos": out_pos}
            )

    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(match, "id string, term string, label string, pos int")
    )


def _resolve_candidates(candidates, matched_ids, parent_of):
    """Pick one item from an ambiguous entry, mirroring the reference
    visitor's acceptance priorities
    (/root/reference/index/region_interpreter_visitor.go:68-257):

    1. **exact child** — a candidate whose parent was already matched
       earlier in this text wins outright (the visitor's 'child of the
       current node' acceptance);
    2. **missing-level bridge** — else a candidate with any already-matched
       ANCESTOR wins (the visitor bridges one skipped hierarchy level,
       e.g. province → district with the city unnamed);
    3. **repeat** — else a candidate already matched itself wins (the
       visitor tolerates re-mentions of the same region);
    4. fallback: the first candidate in insertion order (stable; the
       reference likewise defaults to the first indexed item).
    """
    for cand in candidates:
        if parent_of.get(cand) in matched_ids:
            return cand
    for cand in candidates:
        anc = parent_of.get(cand)
        while anc is not None:
            if anc in matched_ids:
                return cand
            anc = parent_of.get(anc)
    for cand in candidates:
        if cand in matched_ids:
            return cand
    return candidates[0]


def extract_hierarchical_terms(
    df: DataFrame,
    entries: list[tuple[str, str, str | None]],
    text_col: str = "canonical_text",
    id_col: str = "conv_id",
) -> DataFrame:
    """(id, term, label, pos) — dictionary hits resolved against a
    HIERARCHY, the transcript analog of the reference's region-trie
    visitor (J4/C5 with disambiguation): many dictionary terms are
    ambiguous (the same name under different parents — the reference's
    test corpus has villages sharing names across towns,
    /root/reference/index/index_test.go:10-56), and the winner is chosen
    by what else the text already matched.

    ``entries`` is (term, node_id, parent_id|None) — e.g. tool families
    ("deploy", "tool.acme.deploy", "org.acme") where plain "deploy" means
    something different inside an acme conversation than a beta one.

    Same execution shape as :func:`extract_dictionary_terms`: the trie +
    parent map broadcast once, Arrow-batched mapInPandas, opt-in path.
    """
    trie = Trie()
    parent_of: dict[str, str | None] = {}
    for term, node_id, parent_id in entries:
        trie.insert_item(term.lower(), node_id)
        parent_of[node_id] = parent_id

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((trie, parent_of))

    def match(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        btrie, bparent = bc.value
        for pdf in batches:
            out_id, out_term, out_label, out_pos = [], [], [], []
            for rid, text in zip(pdf["id"], pdf["text"]):
                low = (text or "").lower()
                matched_ids: set[str] = set()
                i = 0
                while i < len(low):
                    hit = btrie.longest_match(low, i)
                    if hit is None:
                        i += 1
                        continue
                    end, items = hit
                    label = _resolve_candidates(items, matched_ids, bparent)
                    matched_ids.add(label)
                    out_id.append(rid)
                    out_term.append(low[i:end])
                    out_label.append(label)
                    out_pos.append(i)
                    i = end
            yield pd.DataFrame(
                {"id": out_id, "term": out_term, "label": out_label, "pos": out_pos}
            )

    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(match, "id string, term string, label string, pos int")
    )
