"""Stage 1 — canonicalize: transcript turns -> conversation documents.

The reference's unit of matching is a single free-text address string; ours
is a *conversation document*: all turn texts of a ``conv_id`` concatenated
in ``turn_idx`` order (SURVEY.md §2.5 W6). The per-row invariant
(BASELINE.json input_hint) is per-turn text equality under stable turn
ordering: splitting ``canonical_text`` on the \\x1e record separator must
recover the source turn texts exactly, in ``turn_idx`` order —
``explode_docs`` provides the inverse for the invariant test. The one
substitution: a literal \\x1e INSIDE a turn text is folded to a space
before joining (in every engine), otherwise the inverse would split
that turn in two; the invariant is exact over the sanitized texts.

Scale notes:
  * Single hash-aggregate on conv_id — the one unavoidable shuffle of this
    stage. With the production Iceberg table partitioned/bucketed by
    ``bucket(N, conv_id)``, Catalyst elides even that (storage-partitioned
    scan); locally the parquet fixture shuffles once.
  * ``collect_list`` is per-conversation (3..10^3 turns), never per-key
    unbounded — no skew risk comparable to blocking keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_SEP = "\x1e"  # record separator: not in [\w\s\-#/], folds to space in norm


def canonicalize(turns: DataFrame) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) -> docs.

    docs(conv_id, canonical_text, n_turns, roles_sig, tools_sig, first_ts)

    ``array_sort`` over struct(turn_idx, ...) sorts by turn_idx first —
    stable turn ordering regardless of input row order.
    """
    sorted_turns = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    )
    return turns.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                sorted_turns,
                # SANITIZE the separator out of turn text: a raw \x1e in
                # tool output would silently split one turn into two on
                # the way back (round-5 review). Folding it to a space is
                # norm-neutral (normalization folds \x1e to space
                # anyway), and the invariant becomes exact over
                # sanitized texts. Applied identically in all four
                # engines (SQL oracle, pandas twin, streaming).
                lambda s: F.regexp_replace(
                    F.coalesce(s["text"], F.lit("")), TURN_SEP, " "
                ),
            ),
            TURN_SEP,
        ).alias("canonical_text"),
        F.count(F.lit(1)).alias("n_turns"),
        # NULL/empty roles contribute NOTHING to the signature
        # (substring(NULL) is NULL and array_join skips nulls) — a
        # deliberate, engine-consistent choice (SQL string_agg, the
        # pandas twin and the streaming op all drop them identically).
        # Consequence: roles_sig positions correspond to the NON-NULL
        # role turns, not to turn_idx — it is an identity/similarity
        # signature, not a positional index.
        F.array_join(
            F.transform(sorted_turns, lambda s: F.substring(s["role"], 1, 1)),
            "",
        ).alias("roles_sig"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.coalesce(F.col("tool"), F.lit("")))
            )
        ).alias("tools_sig"),
        F.min("ts").alias("first_ts"),
    )


def explode_docs(docs: DataFrame) -> DataFrame:
    """Inverse of canonicalize for the invariant test: docs -> (conv_id,
    turn_idx, text)."""
    return docs.select(
        "conv_id",
        F.posexplode(F.split(F.col("canonical_text"), TURN_SEP, -1)).alias(
            "turn_idx", "text"
        ),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))
