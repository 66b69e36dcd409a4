"""Typed terms + boosts — reference-parity structure features.

The reference's ``analyze`` turns the PARSED fields of an address into
typed terms (province '1', city '2', ... road 'R', road-number 'N', free
text 'X'; /root/reference/models/term.go:3-17, core/similarity.go:109-229)
and its scorer multiplies each matched term's weight by a type-dependent
boost (province/city/district ×4, street ×0.25, town/village conditional,
road ×2, road-number 3.0 exact or (1/⁴√(|Δ|+1))·2 near-miss;
/root/reference/core/similarity.go:264-324, constants :13-17).

Transcripts have structure too: who spoke (roles), which tools ran, how
long the conversation is. This module emits those as TYPED TOKENS in the
same namespace as text tokens — ``role:assistant``, ``tool:bash``,
``nturns:8`` — so the standard TF-IDF + cosine machinery scores them with
no scorer changes, and a boost map (the C14 analog) scales their weight by
type. All JVM-side (explode + concat); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig

#: type-code → weight multiplier (analog of the reference's boost table,
#: /root/reference/core/similarity.go:13-17: province/city ×4, road ×2...)
DEFAULT_BOOSTS = {
    "X": 1.0,   # free text (reference TextTerm, BoostM=1)
    "R": 2.0,   # role     (≈ reference road ×2: strong structural signal)
    "T": 2.0,   # tool
    "N": 3.0,   # turn-count bucket, exact match (≈ reference road-number
    #             exact boost 3.0, similarity.go:308; the near-miss
    #             dampening for UNequal buckets is pair-conditional and
    #             applied in scoring.score_pairs via nearmiss_boost)
}


def nturns_bucket(col):
    """Power-of-two bucket of a turn count — the token value of the
    ``nturns:`` typed term. Shared by :func:`typed_tokens` and the pair
    scorer's near-miss adjustment so the two always agree."""
    return (
        F.pow(F.lit(2.0), F.floor(F.log2(col.cast("double"))))
        .cast("int")
        .cast("string")
    )


def nearmiss_boost(delta):
    """The reference's road-number near-miss boost
    (/root/reference/core/similarity.go:305-316): numbers on the same road
    that differ by Δ still contribute, dampened by
    ``(1/⁴√(Δ+1))·BoostL`` with BoostL=2. Here Δ = |n_turns_a−n_turns_b|:
    two captures of the same conversation that differ by a few turns
    (the transcript analog of adjacent door numbers) keep a dampened
    structural-signal contribution instead of dropping to zero."""
    return F.lit(2.0) / F.pow(F.abs(delta).cast("double") + F.lit(1.0), F.lit(0.25))


#: exact-match boost for the nturns term (reference RoadNum exact match
#: boost = 3.0, /root/reference/core/similarity.go:308)
NTURNS_EXACT_BOOST = 3.0


def typed_tokens(conversations: DataFrame) -> DataFrame:
    """(conv_id, token, type) structural tokens from canonicalized
    conversations: one ``role:<r>`` per distinct role, one ``tool:<t>``
    per distinct tool, one ``nturns:<bucket>`` (power-of-two bucket, so a
    one-turn insertion — the near-miss — usually keeps the token equal).
    """
    roles = conversations.select(
        "conv_id",
        F.explode(F.array_distinct("roles")).alias("raw"),
    ).select(
        "conv_id", F.concat(F.lit("role:"), F.col("raw")).alias("token"),
        F.lit("R").alias("type"),
    )
    tools = conversations.select(
        "conv_id",
        F.explode(F.array_distinct("tools")).alias("raw"),
    ).select(
        "conv_id", F.concat(F.lit("tool:"), F.col("raw")).alias("token"),
        F.lit("T").alias("type"),
    )
    nturns = conversations.select(
        "conv_id",
        F.concat(F.lit("nturns:"), nturns_bucket(F.col("n_turns"))).alias("token"),
        F.lit("N").alias("type"),
    )
    return roles.unionByName(tools).unionByName(nturns)


def boost_weights(
    tokens_with_type: DataFrame, boosts: dict[str, float] | None = None
) -> DataFrame:
    """Attach the boost column from the type code (static F.when chain —
    the JVM-side half of reference C14). The pair-conditional near-miss
    half (:func:`nearmiss_boost`) is applied by ``scoring.score_pairs``
    when cfg.use_structure is set — see the ``nturns near-miss`` block
    there."""
    boosts = boosts or DEFAULT_BOOSTS
    col = F.lit(boosts.get("X", 1.0))
    for code, w in boosts.items():
        col = F.when(F.col("type") == code, F.lit(float(w))).otherwise(col)
    return tokens_with_type.withColumn("boost", col)


def tokens_with_structure(
    conversations: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Text tokens (type 'X', positions kept) ∪ typed structural tokens —
    drop-in replacement for ``explode_tokens`` when structure-aware
    scoring is wanted: downstream TF-IDF/blocking/scoring are unchanged
    because typed tokens live in the same (conv_id, token) namespace
    (prefixes make collisions with text tokens impossible: ':' is not a
    token character)."""
    from ..functions.tokenize import explode_tokens

    text = explode_tokens(conversations, cfg).select(
        "conv_id", "pos", "token", F.lit("X").alias("type")
    )
    typed = typed_tokens(conversations).select(
        "conv_id", F.lit(-1).alias("pos"), "token", "type"
    )
    return text.unionByName(typed)
