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
    /root/reference/index/term_index_entry.go:8-38)."""

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
