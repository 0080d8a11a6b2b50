"""Single-node pandas twin of the FULL linkage pipeline (blocking
included) — the oracle for the two kernel-based contract queries.

``pipeline.oracle`` twins the scoring semantics; this module twins the
DISTRIBUTED parts — events->turns derivation, canonicalize, featurize
(blocking keys via the engine-neutral hash, ``pipeline.hashing.h60_py``),
hot-key capping, per-key pair caps — so a plain pandas+hashlib run
reproduces the exact candidate pair set of ``pipeline.blocking`` with no
Spark involved. ``__spark_entry__.oracle_sql`` runs it over the sf0.01
parquet and inlines the results as VALUES for the driver's DuckDB check
(clusters are NOT inlined from here — only edges; DuckDB computes the
transitive closure itself with a recursive CTE, independently verifying
the large-star/small-star implementation).

Scale note: this module is an ORACLE, not an execution path — it exists
to certify the distributed implementation at test scale.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd

from pipeline import oracle
from pipeline.config import DEFAULT_CONFIG, MatchConfig
from pipeline.hashing import COIN_MOD, h60_py

ANCHOR_FAMILY = 4


def turns_from_events_pd(events: pd.DataFrame) -> pd.DataFrame:
    """Twin of ``__spark_entry__._turns_from_events`` (and _TURNS_SQL)."""
    ev = events.sort_values(["user_id", "ts", "event_id"]).copy()
    ev["turn_idx"] = ev.groupby("user_id").cumcount().astype("int32")
    # Spark cast(double as string) == Java Double.toString == Python str
    # for plain-notation doubles (values here are in [1e-3, 1e7))
    # NULL value/event_type null-propagates the WHOLE text, exactly like
    # Spark's F.concat (and || in DuckDB); .map(str) rendered NaN as the
    # literal 'nan', diverging on the degenerate rows a parity twin
    # should cover (round-5 review)
    ev["text"] = (
        ev["event_type"]
        + " "
        + ev["value"].map(
            lambda v: None if pd.isna(v) else str(v)
        )
        + " "
        + ev["props"].fillna("")
    )
    return pd.DataFrame(
        {
            "conv_id": "u" + ev["user_id"].astype(str),
            "turn_idx": ev["turn_idx"],
            "role": ev["event_type"],
            "text": ev["text"],
            "ts": ev["ts"],
        }
    )


def turns_from_documents_pd(documents: pd.DataFrame) -> pd.DataFrame:
    """Twin of ``__spark_entry__._turns_from_documents``: each document is
    a single-turn 'user' conversation (constant ts — documents carry no
    event time)."""
    return pd.DataFrame(
        {
            "conv_id": "d" + documents["doc_id"].astype(str),
            "turn_idx": pd.Series(
                [0] * len(documents), dtype="int32", index=documents.index
            ),
            "role": "user",
            "text": documents["text"],
            "ts": pd.Timestamp("2024-01-01"),
        }
    )


def _doc_keys(norm: str, cfg: MatchConfig) -> list[tuple[int, int]]:
    """Families 0-3 for one doc — twin of ``features.featurize``."""
    tokens = [t for t in norm.split(" ") if t]
    keys = [
        (0, h60_py(norm)),
        (1, h60_py(" ".join(sorted(set(tokens))))),
        (2, h60_py(norm[: cfg.prefix_key_len])),
    ]
    n = cfg.shingle_size
    shingles = {norm[i : i + n] for i in range(max(len(norm) - n + 1, 1))}
    mh = [
        min(h60_py(i, g) for g in shingles)
        for i in range(cfg.minhash_hashes)
    ]
    rows = cfg.minhash_hashes // cfg.minhash_bands
    for b in range(cfg.minhash_bands):
        band = mh[b * rows : (b + 1) * rows]
        keys.append((3, h60_py("band", b, *band)))
    return keys


def blocking_pairs_pd(
    docs: pd.DataFrame, cfg: MatchConfig = DEFAULT_CONFIG
) -> pd.DataFrame:
    """Twin of ``blocking.candidate_pairs`` over featurized docs
    (needs columns conv_id, norm_text, roles_sig). Returns the deduped
    (conv_id_a, conv_id_b) pair set with the families count."""
    # P2 gate — twin of blocking.required_feature_gate
    eligible = docs
    if cfg.require_text:
        eligible = eligible[eligible["norm_text"].str.len() > 0]
    if cfg.require_roles:
        eligible = eligible[eligible["roles_sig"].str.len() > 0]

    rows: list[tuple[int, int, str]] = []  # (family, key, conv_id)
    doc_tokens: dict[str, list[str]] = {}
    for conv_id, norm in zip(eligible["conv_id"], eligible["norm_text"]):
        for fam, key in _doc_keys(norm, cfg):
            rows.append((fam, key, conv_id))
        doc_tokens[conv_id] = sorted(
            {t for t in norm.split(" ") if t}
        )

    # anchor keys (family 4) — twin of blocking.anchor_key_table
    df_counts: dict[str, int] = {}
    for toks in doc_tokens.values():
        for t in toks:
            df_counts[t] = df_counts.get(t, 0) + 1
    for conv_id, toks in doc_tokens.items():
        anchors = sorted(
            (
                (df_counts[t], t)
                for t in toks
                if 2 <= df_counts[t] <= cfg.anchor_max_df
            )
        )[: cfg.anchor_tokens]
        for _df, t in anchors:
            rows.append((ANCHOR_FAMILY, h60_py(t), conv_id))

    keyed = pd.DataFrame(rows, columns=["family", "key", "conv_id"])

    # hot-key capping — twin of blocking.capped_key_table
    counts = keyed.groupby(["family", "key"])["conv_id"].transform("size")
    coin = keyed.apply(
        lambda r: (h60_py("coin", r["conv_id"], r["key"]) % COIN_MOD)
        / float(COIN_MOD),
        axis=1,
    )
    keep = (counts <= cfg.block_key_cap) | (
        coin < float(cfg.block_key_cap) / counts
    )
    # star mode (twin of blocking._cap_members hub force-keep +
    # blocking.hot_star_pairs): per hot key, the full-membership minimum
    # (hub) is always kept, and one (hub, member) edge is added per
    # coin-dropped member
    star_by_key: dict[tuple[int, int], list[tuple[str, str]]] = {}
    if cfg.hot_key_star:
        hub = keyed.groupby(["family", "key"])["conv_id"].transform("min")
        is_hot = counts > cfg.block_key_cap
        dropped = is_hot & ~keep & (keyed["conv_id"] != hub)
        for fam, k, h, m in zip(
            keyed.loc[dropped, "family"],
            keyed.loc[dropped, "key"],
            hub[dropped],
            keyed.loc[dropped, "conv_id"],
        ):
            star_by_key.setdefault((int(fam), int(k)), []).append((h, m))
        keep = keep | (keyed["conv_id"] == hub)
    keyed = keyed[keep]

    # per-(family,key) pair generation with the ordered, star-preserving
    # pair cap (twin of candidate_pairs: rn <= cap OR a == key minimum —
    # lexicographic pair order lists every (min, .) pair first, so past
    # the cap only min-left pairs survive) + the per-pair family set
    # (twin of collect_set(family) — score_pairs_pd uses len(families)
    # for the quality n_families term). In star mode the raw pair list
    # per key is the kept-member clique UNION the hub star edges, ranked
    # lexicographically together, exactly as star_capped_pairs sees it.
    pair_fams: dict[tuple[str, str], set[int]] = {}
    for (fam, _key), grp in keyed.groupby(["family", "key"]):
        members = sorted(grp["conv_id"])
        raw_pairs = list(combinations(members, 2))
        key_star = star_by_key.get((int(fam), int(_key)))
        if key_star:
            raw_pairs = sorted(set(raw_pairs) | set(key_star))
        for n_emitted, (a, b) in enumerate(raw_pairs):
            if n_emitted >= cfg.pairs_per_key_cap and a != members[0]:
                break
            pair_fams.setdefault((a, b), set()).add(int(fam))
    out = pd.DataFrame(
        [(a, b, sorted(fams)) for (a, b), fams in sorted(pair_fams.items())],
        columns=["conv_id_a", "conv_id_b", "families"],
    )
    return out


def linkage_pd(
    turns: pd.DataFrame, cfg: MatchConfig = DEFAULT_CONFIG
) -> dict[str, pd.DataFrame]:
    """Full twin: turns -> docs -> pairs -> scored -> match edges ->
    clusters (union-find; entity_id = min conv_id of the component)."""
    docs = oracle.featurize_pd(oracle.canonicalize_pd(turns))
    pairs = blocking_pairs_pd(docs, cfg)
    scored = oracle.score_pairs_pd(docs, pairs, cfg)

    parent: dict[str, str] = {c: c for c in docs["conv_id"]}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # zero candidate pairs -> score_pairs_pd returns a COLUMN-LESS empty
    # frame, and the zip below raised KeyError instead of yielding the
    # correct all-singletons labeling (round-5 review)
    match_rows = (
        zip(scored["conv_id_a"], scored["conv_id_b"], scored["is_match"])
        if len(scored)
        else ()
    )
    for a, b, m in match_rows:
        if m:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp: dict[str, list[str]] = {}
    for c in parent:
        comp.setdefault(find(c), []).append(c)
    clusters = pd.DataFrame(
        [(c, root) for root, members in comp.items() for c in members],
        columns=["conv_id", "entity_id"],
    ).sort_values(["conv_id"]).reset_index(drop=True)
    return {"docs": docs, "pairs": pairs, "scored": scored, "clusters": clusters}


# ---------------------------------------------------------------------------
# Fellegi–Sunter twin (numpy-vectorized — independent of the plain-float
# loop in pipeline/fellegi_sunter.py; both round to 6 dp, which absorbs
# the summation-order FP noise between the two implementations)
# ---------------------------------------------------------------------------


def fs_patterns_pd(
    scored: pd.DataFrame, channels: list[tuple[str, float]]
) -> pd.DataFrame:
    """Twin of ``fellegi_sunter.comparison_patterns``: binarize the
    channel scores and count agreement patterns."""
    import numpy as np

    cols = ["pattern"] + [f"g_{name}" for name, _ in channels] + ["n_pairs"]
    if not len(scored):
        # zero scored pairs (tiny SF / blocking found nothing): an empty
        # pattern table, schema-correct — the .str accessor below raises
        # on an empty object column, which made fs_em_pd's carefully
        # mirrored empty-table fallback unreachable (round-5 review)
        return pd.DataFrame(
            {
                "pattern": pd.Series([], dtype=str),
                **{f"g_{name}": pd.Series([], dtype=int)
                   for name, _ in channels},
                "n_pairs": pd.Series([], dtype=int),
            }
        )[cols]
    gam = np.column_stack(
        [
            (scored[f"s_{name}"].to_numpy() >= thr).astype(int)
            for name, thr in channels
        ]
    )
    pats = ["".join(map(str, row)) for row in gam]
    df = pd.DataFrame({"pattern": pats})
    counts = df.groupby("pattern").size().reset_index(name="n_pairs")
    for i, (name, _thr) in enumerate(channels):
        counts[f"g_{name}"] = counts["pattern"].str[i].astype(int)
    return counts[cols].sort_values("pattern").reset_index(drop=True)


def fs_em_pd(
    patterns: pd.DataFrame,
    channels: list[tuple[str, float]],
    iters: int,
    init_p: float,
    init_m: float,
    init_u: float,
) -> pd.DataFrame:
    """Twin of ``fellegi_sunter.em_weights`` from a pattern-count table:
    vectorized EM over the (≤ 2^C)-row pattern matrix."""
    import numpy as np

    pat = patterns.sort_values("pattern")
    gam = np.array([[int(c) for c in s] for s in pat["pattern"]], dtype=float)
    n = pat["n_pairs"].to_numpy(dtype=float)
    total = n.sum()
    C = len(channels)
    p, m, u = init_p, np.full(C, init_m), np.full(C, init_u)
    eps = 1e-6
    if total == 0.0:
        # empty pattern table: mirror _em's no-update fallback exactly
        p = min(max(init_p, eps), 1.0 - eps)
        m = np.clip(m, eps, 1.0 - eps)
        u = np.clip(u, eps, 1.0 - eps)
        iters = 0
    for _ in range(iters):
        pm = p * np.prod(np.where(gam == 1.0, m, 1.0 - m), axis=1)
        pu = (1.0 - p) * np.prod(np.where(gam == 1.0, u, 1.0 - u), axis=1)
        denom = pm + pu
        g = np.where(denom > 0.0, pm / np.where(denom == 0.0, 1.0, denom), 0.5)
        sum_g = float((n * g).sum())
        sum_u = float((n * (1.0 - g)).sum())
        p = min(max(sum_g / total, eps), 1.0 - eps)
        if sum_g > 0:
            m = np.clip((n * g) @ gam / sum_g, eps, 1.0 - eps)
        else:
            m = np.full(C, eps)
        if sum_u > 0:
            u = np.clip((n * (1.0 - g)) @ gam / sum_u, eps, 1.0 - eps)
        else:
            u = np.full(C, eps)
    rows = [
        (
            name,
            round(float(m[i]), 6),
            round(float(u[i]), 6),
            round(float(np.log2(m[i] / u[i])), 6),
            round(float(np.log2((1.0 - m[i]) / (1.0 - u[i]))), 6),
            round(float(p), 6),
        )
        for i, (name, _thr) in enumerate(channels)
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "channel",
            "m_prob",
            "u_prob",
            "w_agree",
            "w_disagree",
            "match_prior",
        ],
    )
