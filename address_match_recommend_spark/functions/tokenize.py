"""Tokenization — the analog of the reference's segmenter interface
(/root/reference/segment/isegment.go:3-5) with two implementations, like the
reference's gse segmenter (/root/reference/segment/gse_segment.go:11-25) and
SimpleSegmenter fallback (/root/reference/segment/simple_segment.go:11-47).

The default path is **JVM-side** (``regexp_extract_all`` inside whole-stage
codegen — faster than any Python UDF); a vectorized pandas-UDF variant
exists for tokenizers that genuinely need Python (custom dictionaries,
CJK segmentation), per the input_hint's "vectorized pandas/Arrow UDFs, no
per-row Python".
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ..config import PipelineConfig

DEFAULT_TOKEN_PATTERN = r"[a-z0-9]+"


def tokenize_col(text: Column, cfg: PipelineConfig | None = None) -> Column:
    """Array-of-tokens column, fully JVM-side (codegen'd)."""
    cfg = cfg or PipelineConfig()
    col = F.lower(text) if cfg.lowercase else text
    toks = F.regexp_extract_all(col, F.lit(cfg.token_pattern), 0)
    if cfg.min_token_len > 1:
        toks = F.filter(toks, lambda t: F.length(t) >= cfg.min_token_len)
    if cfg.stopwords:
        stop = F.array(*[F.lit(s) for s in cfg.stopwords])
        toks = F.filter(toks, lambda t: ~F.array_contains(stop, t))
    return toks


def explode_tokens(
    conversations: DataFrame,
    cfg: PipelineConfig | None = None,
    text_col: str = "canonical_text",
    id_col: str = "conv_id",
) -> DataFrame:
    """(conv_id, pos, token) — positions kept for density-style features
    (reference A5, /root/reference/core/similarity.go:467-483)."""
    return conversations.select(
        id_col,
        F.posexplode(tokenize_col(F.col(text_col), cfg)).alias("pos", "token"),
    )


def make_tokenize_udf(cfg: PipelineConfig | None = None):
    """Arrow-vectorized pandas UDF tokenizer (the Python slow path).

    Only needed when tokenization requires Python (e.g. a broadcast
    dictionary segmenter like the reference's gse/jieba); the default
    pipeline uses :func:`tokenize_col`.
    """
    import re

    cfg = cfg or PipelineConfig()
    pattern = re.compile(cfg.token_pattern)
    stop = set(cfg.stopwords)
    min_len = cfg.min_token_len
    lower = cfg.lowercase

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            src = s.fillna("")
            if lower:
                src = src.str.lower()
            out = src.map(
                lambda x: [
                    t for t in pattern.findall(x) if len(t) >= min_len and t not in stop
                ]
            )
            yield out

    return tokenize_udf
