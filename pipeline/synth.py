"""Deterministic synthetic transcript corpus generator (FIXTURES.md).

Generalizes the reference's de-facto golden corpus — 5 canonical records
with controlled near-duplicate structure, replicated x20
(``ultimate_address_matcher.py:1165-1212``) — to the transcript domain:
base conversations each spawn 0..4 duplicates drawn from classes that map
1:1 to the reference's cascade tiers (FIXTURES.md §1):

  exact      byte-identical turns, new conv_id/ts          -> tier exact
  norm_eq    case/space/punct/accent changes only          -> tier exact
  token_swap token reorder within turns                    -> relaxed/partial
  typo       char edits, InDel ratio ~85-95                -> relaxed..fuzzy
  truncate   drop trailing turns                           -> partial..fuzzy
  heavy      edit rate pushing similarity to ~45-60        -> fuzzy/ultra_fuzzy
  distractor different conv sharing a blocking key         -> non-match
  hotkey     many convs with one degenerate normalized text-> skew stressor

Everything is seeded (no wall-clock, no external data). Output: pandas
DataFrames with the exact ``input_hint`` schema
(conv_id, turn_idx:int32, role, text, tool, ts) written in SHUFFLED row
order so canonicalization must actually sort by turn_idx.
"""

from __future__ import annotations

import random
import string
from dataclasses import dataclass
from datetime import datetime, timedelta

import pandas as pd

ROLES_CYCLE = ["user", "assistant"]
TOOLS = ["search", "calculator", "browser", "python", "sql"]

_ACCENT_SUBS = {"a": "à", "e": "é", "i": "î", "o": "ö", "u": "ü", "c": "ç"}
_PUNCT = [",", ".", "!", "?", ";", ":"]


def _vocab(rng: random.Random, size: int = 8000) -> tuple[list[str], list[float]]:
    """Zipf-weighted vocabulary — realistic heavy-tailed token frequencies
    (a long tail of rare tokens, as in real transcripts). The rare tail is
    what the anchor-key blocking family exploits."""
    words = set()
    while len(words) < size:
        n = rng.randint(3, 9)
        words.add("".join(rng.choice(string.ascii_lowercase) for _ in range(n)))
    ordered = sorted(words)
    rng.shuffle(ordered)
    weights = [1.0 / (rank + 1) for rank in range(size)]
    return ordered, weights


@dataclass
class SynthCorpus:
    """turns + ground truth tables."""

    turns: pd.DataFrame            # conv_id, turn_idx, role, text, tool, ts
    conv_meta: pd.DataFrame        # conv_id, dup_class, entity_id (hotkey excluded from labels)
    true_pairs: pd.DataFrame       # conv_id_a, conv_id_b, dup_class, is_match
    expected_clusters: pd.DataFrame  # conv_id, entity_id (hotkey excluded)


def generate(
    n_base: int = 200,
    seed: int = 42,
    hotkey_convs: int = 0,
    distractor_rate: float = 0.15,
) -> SynthCorpus:
    rng = random.Random(seed)
    vocab, weights = _vocab(rng)
    base_ts = datetime(2025, 1, 1)

    turn_rows: list[tuple] = []
    conv_meta: list[tuple[str, str, str]] = []  # conv_id, dup_class, entity_id
    pair_rows: list[tuple[str, str, str, bool]] = []

    def sentence() -> str:
        return " ".join(
            rng.choices(vocab, weights=weights, k=rng.randint(4, 12))
        )

    def emit(conv_id: str, texts: list[str], conv_ord: int) -> None:
        t0 = base_ts + timedelta(minutes=conv_ord)
        for i, text in enumerate(texts):
            role = ROLES_CYCLE[i % 2]
            tool = None
            if rng.random() < 0.08:
                role = "tool"
                tool = rng.choice(TOOLS)
            turn_rows.append(
                (conv_id, i, role, text, tool, t0 + timedelta(seconds=i))
            )

    # --- perturbation functions -------------------------------------------
    def perturb_norm_eq(texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            chars = []
            for ch in t:
                if ch.isalpha() and rng.random() < 0.15:
                    ch = ch.upper()
                if ch in _ACCENT_SUBS and rng.random() < 0.05:
                    ch = _ACCENT_SUBS[ch]
                chars.append(ch)
            s = "".join(chars)
            if rng.random() < 0.5:
                s = s.replace(" ", "  ", 1)
            if rng.random() < 0.5:
                s = s + rng.choice(_PUNCT)
            out.append(s)
        return out

    def perturb_token_swap(texts: list[str]) -> list[str]:
        out = []
        for t in texts:
            toks = t.split()
            rng.shuffle(toks)
            out.append(" ".join(toks))
        return out

    def char_edits(t: str, rate: float) -> str:
        chars = list(t)
        n_edits = max(1, int(len(chars) * rate))
        for _ in range(n_edits):
            pos = rng.randrange(len(chars))
            op = rng.random()
            if op < 0.4:
                chars[pos] = rng.choice(string.ascii_lowercase)
            elif op < 0.7:
                chars.insert(pos, rng.choice(string.ascii_lowercase))
            elif len(chars) > 4:
                del chars[pos]
        return "".join(chars)

    def perturb_typo(texts: list[str]) -> list[str]:
        return [char_edits(t, 0.03) for t in texts]

    def perturb_truncate(texts: list[str]) -> list[str]:
        keep = max(1, int(len(texts) * rng.uniform(0.5, 0.7)))
        return texts[:keep]

    def perturb_heavy(texts: list[str]) -> list[str]:
        return [char_edits(t, 0.18) for t in texts]

    PERTURB = {
        "exact": lambda ts: list(ts),
        "norm_eq": perturb_norm_eq,
        "token_swap": perturb_token_swap,
        "typo": perturb_typo,
        "truncate": perturb_truncate,
        "heavy": perturb_heavy,
    }
    dup_classes = list(PERTURB)

    conv_ord = 0
    for b in range(n_base):
        base_id = f"c{b:06d}a"
        n_turns = rng.randint(3, 12)
        base_texts = [sentence() for _ in range(n_turns)]
        emit(base_id, base_texts, conv_ord)
        conv_meta.append((base_id, "base", base_id))
        conv_ord += 1

        group = [(base_id, base_texts)]
        n_dups = rng.choices([0, 1, 2, 3, 4], weights=[25, 30, 25, 12, 8])[0]
        for d in range(n_dups):
            dup_class = rng.choice(dup_classes)
            # chain from a random earlier member -> exercises transitivity
            src_id, src_texts = rng.choice(group)
            dup_id = f"c{b:06d}{chr(ord('b') + d)}"
            dup_texts = PERTURB[dup_class](src_texts)
            emit(dup_id, dup_texts, conv_ord)
            conv_meta.append((dup_id, dup_class, base_id))
            pair_rows.append((src_id, dup_id, dup_class, True))
            group.append((dup_id, dup_texts))
            conv_ord += 1

        # distractor: shares the leading tokens of turn 0 (hence the
        # prefix blocking key) but is a different conversation -> must
        # score below the match threshold
        if rng.random() < distractor_rate:
            dis_id = f"c{b:06d}x"
            # share enough leading text to collide on the 32-char prefix
            # blocking key, then diverge hard (longer conversation, fresh
            # content) so confidence stays below the match threshold
            shared_prefix = base_texts[0][:40]
            dis_texts = [shared_prefix + " " + sentence()] + [
                sentence() for _ in range(rng.randint(10, 16))
            ]
            emit(dis_id, dis_texts, conv_ord)
            conv_meta.append((dis_id, "distractor", dis_id))
            pair_rows.append((base_id, dis_id, "distractor", False))
            conv_ord += 1

    # hotkey skew stressor: many convs, one degenerate normalized text
    boiler = ["ok", "thanks", "ok"]
    for h in range(hotkey_convs):
        hid = f"hot{h:06d}"
        emit(hid, boiler, conv_ord)
        conv_meta.append((hid, "hotkey", "hotkey"))
        conv_ord += 1

    turns = pd.DataFrame(
        turn_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    # shuffled row order (FIXTURES.md: canonicalization must sort)
    turns = turns.sample(frac=1.0, random_state=seed).reset_index(drop=True)

    meta = pd.DataFrame(conv_meta, columns=["conv_id", "dup_class", "entity_id"])

    pairs = pd.DataFrame(
        pair_rows, columns=["conv_id_a", "conv_id_b", "dup_class", "is_match"]
    )
    # canonical ordering conv_id_a < conv_id_b
    swap = pairs["conv_id_a"] > pairs["conv_id_b"]
    pairs.loc[swap, ["conv_id_a", "conv_id_b"]] = pairs.loc[
        swap, ["conv_id_b", "conv_id_a"]
    ].values

    clusters = (
        meta[meta["dup_class"] != "hotkey"][["conv_id", "entity_id"]]
        .copy()
        .reset_index(drop=True)
    )

    return SynthCorpus(
        turns=turns, conv_meta=meta, true_pairs=pairs, expected_clusters=clusters
    )


def generate_skew(
    n_base: int = 5000,
    boiler_members: int = 20000,
    hotkey_convs: int = 2000,
    seed: int = 17,
) -> SynthCorpus:
    """Adversarial-skew corpus (round-4 VERDICT task 1): the ordinary
    Zipf-vocabulary corpus PLUS one boilerplate near-duplicate MEGA-GROUP
    (``boiler_members`` conversations, one true entity — the power-law
    head a 100-TB transcript corpus always has) and a block of
    degenerate normalized texts (``hotkey_convs`` byte-identical tiny
    convs). Every production cap must BIND on this corpus.

    Mega-group perturbation mix (all classes share at least one
    degenerate blocking key family with the whole group, so under
    ``hot_key_star`` the group must resolve to ONE entity):

      60% exact copies           -> exact-norm key (family 0)
      30% normalization noise    -> same normalized text, same family 0
      10% token reorder          -> same token_set key (family 1);
                                    token_sort channel still scores 100
    """
    corpus = generate(n_base=n_base, seed=seed, hotkey_convs=hotkey_convs)
    rng = random.Random(seed + 999)
    base_ts = datetime(2026, 1, 1)
    boiler_texts = [
        "subscribe to our newsletter for weekly updates and offers",
        "thank you for contacting support your ticket has been received",
        "this conversation may be recorded for quality assurance",
        "have a great day and thank you for choosing our service",
    ]
    rows: list[tuple] = []
    meta_rows: list[tuple[str, str, str]] = []
    hub_id = "boil000000"
    for i in range(boiler_members):
        cid = f"boil{i:06d}"
        r = rng.random()
        if r < 0.6:
            texts = list(boiler_texts)
            cls = "boiler_exact"
        elif r < 0.9:
            texts = []
            for t in boiler_texts:
                s = "".join(
                    ch.upper()
                    if ch.isalpha() and rng.random() < 0.2
                    else ch
                    for ch in t
                )
                if rng.random() < 0.5:
                    s += rng.choice(_PUNCT)
                if rng.random() < 0.3:
                    s = s.replace(" ", "  ", 1)
                texts.append(s)
            cls = "boiler_norm"
        else:
            texts = [
                " ".join(
                    sorted(t.split(), key=lambda _w: rng.random())
                )
                for t in boiler_texts
            ]
            cls = "boiler_swap"
        t0 = base_ts + timedelta(seconds=i)
        for j, text in enumerate(texts):
            rows.append(
                (cid, j, ROLES_CYCLE[j % 2], text, None,
                 t0 + timedelta(seconds=j))
            )
        meta_rows.append((cid, cls, hub_id))

    boiler_turns = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    boiler_turns["turn_idx"] = boiler_turns["turn_idx"].astype("int32")
    turns = (
        pd.concat([corpus.turns, boiler_turns], ignore_index=True)
        .sample(frac=1.0, random_state=seed)
        .reset_index(drop=True)
    )
    meta = pd.concat(
        [
            corpus.conv_meta,
            pd.DataFrame(
                meta_rows, columns=["conv_id", "dup_class", "entity_id"]
            ),
        ],
        ignore_index=True,
    )
    clusters = pd.concat(
        [
            corpus.expected_clusters,
            pd.DataFrame(
                [(cid, hub_id) for cid, _cls, _e in meta_rows],
                columns=["conv_id", "entity_id"],
            ),
        ],
        ignore_index=True,
    )
    return SynthCorpus(
        turns=turns,
        conv_meta=meta,
        true_pairs=corpus.true_pairs,
        expected_clusters=clusters,
    )


def write_parquet(corpus: SynthCorpus, out_dir: str) -> dict[str, str]:
    """Write corpus tables as parquet; returns name -> path."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name in ["turns", "conv_meta", "true_pairs", "expected_clusters"]:
        p = os.path.join(out_dir, f"{name}.parquet")
        df = getattr(corpus, name)
        # pandas defaults to ns-precision timestamps, which Spark's parquet
        # reader rejects (PARQUET_TYPE_ILLEGAL); write us-precision
        for col in df.columns:
            if df[col].dtype.kind == "M":
                df = df.assign(**{col: df[col].astype("datetime64[us]")})
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
