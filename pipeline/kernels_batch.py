"""Numpy-vectorized batch twins of the pair-scoring kernels.

The pair-scoring pandas UDF is the one Python stage on the pair path
(SURVEY.md §2.11); round 2 measured its per-pair cost at ~520 us, 64% in
the bit-parallel LCS (``kernels.lcs_length``) and ~30% in the Jaro greedy
(``kernels.jaro``) — pure-Python loops over big-int bitmasks. This module
re-expresses BOTH as SIMD-across-pairs numpy kernels over uint64 words:

* ``batch_indel_distance`` — Hyyro's bit-vector LCS, identical recurrence
  (``v = ((v + t) | (v - t)) & full``), with the bit vector laid out as
  ``W = ceil(len(shorter)/64)`` little-endian uint64 words per pair and
  the per-character loop running across the whole batch at once.  Add /
  subtract carry/borrow chains are propagated word-by-word (W is small:
  ~5 for the median 300-char text).  Pairs are grouped by W and chunked
  so the per-chunk char->mask table stays ~32 MB.
* ``batch_jaro`` — bit-parallel Jaro over the 128-char prefix (so exactly
  two words): pass 1 replicates the reference greedy (for each a[i] in
  order, match the lowest unused b-position of that char inside the Jaro
  window) via lowest-set-bit extraction on (char-mask & window-mask &
  unused-mask); pass 2 re-pops the matched b-positions in ascending order
  against a's matched chars to count transpositions — the same (m, t)
  integers as ``kernels.jaro``'s cursor greedy, batched.

Bit-equality with the per-pair kernels is BY CONSTRUCTION, not accident:
the batch path computes the same INTEGER quantities (InDel distance,
match count m, transposition count t, common-prefix length) and then
applies the same float formulas in the same operation order (IEEE-754
doubles are deterministic, and numpy float64 elementwise ops are the same
C-double ops the scalar Python code performs).  The window set scored by
batch partial_ratio is the same set via the shared
``kernels.partial_windows``.  ``tests/test_kernels_batch.py`` pins the
equality over synth-corpus pairs, documents-table pairs and adversarial
hypothesis strings.

Strings that are not clean ASCII (non-ASCII after normalization can only
come from un-normalized role signatures; NUL bytes never) fall back to
the per-pair kernels — the batch layout indexes char->mask tables by byte
value, and index 0 doubles as the padding sentinel.

Scale note: this is a per-batch CPU kernel inside the single Arrow stage;
it changes the constant factor only — the distributed plan (ids-only
repartition, broadcast text join, no shuffle) is unchanged.
"""

from __future__ import annotations

import numpy as np

from pipeline import kernels
from pipeline.config import DEFAULT_CONFIG, MatchConfig

_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)
_ONE = np.uint64(1)
_ZERO = np.uint64(0)
_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)

# rows * W budget per chunk: the char->mask table is rows x A x W uint64
# (A ~ 36 compact alphabet) -> ~10 MB table per chunk per worker.
_CHUNK_WORD_ROWS = 32768
# how many adjacent word-widths may share one (padded) chunk
_MERGE_WIDTHS = 2
# below this many pairs per call, the per-pair kernels win (numpy op
# dispatch overhead; measured crossover ~600 pairs on ~300-char texts)
_BATCH_MIN_ROWS = 600


def _clean_ascii(s: str) -> bool:
    """Batch-eligible: ASCII and no NUL (byte 0 is the padding sentinel)."""
    return s.isascii() and "\x00" not in s


from functools import lru_cache


@lru_cache(maxsize=16384)
def _encode1(s: str) -> np.ndarray:
    """Cached 1-D uint8 byte view of an ASCII string (doc texts and their
    sorted forms recur across many pairs in blocked scoring)."""
    return np.frombuffer(s.encode("ascii"), dtype=np.uint8)


def _encode_padded(strs: list[str], max_len: int) -> np.ndarray:
    """[n, max_len] uint8 byte matrix, NUL-padded."""
    out = np.zeros((len(strs), max_len), dtype=np.uint8)
    for i, s in enumerate(strs):
        bs = _encode1(s)
        out[i, : len(bs)] = bs
    return out


def _lowmask(k: np.ndarray) -> np.ndarray:
    """Per-element uint64 with the low ``clip(k, 0, 64)`` bits set."""
    k = np.clip(k, 0, 64)
    kk = np.minimum(k, 63).astype(np.uint64)
    base = (_ONE << kk) - _ONE
    return np.where(k >= 64, _FULL, base)


def _chunk_indel_distance(
    shorts: list[str], longs: list[str], W: int
) -> np.ndarray:
    """InDel distances for one chunk of pairs (mask string = shorter;
    every pair's shorter side fits in W uint64 words — shorter widths are
    PADDED up to the chunk's W so chunks stay large; numpy op dispatch
    overhead at small row counts costs more than the dead padded words).

    Identical recurrence to ``kernels.lcs_length`` with the big int split
    into W little-endian uint64 words; rows sorted by longer-length
    descending so the active prefix shrinks as j passes each row's end
    (padding would be a no-op anyway — char id 0 has an all-zero mask —
    but the shrink skips the dead numpy work). The multi-word carry of
    ``v + t`` is propagated Kogge-Stone style on the whole [act, W]
    matrix (add all words, shift carry-outs up one word, repeat while any
    — almost always a single extra round) instead of a per-word Python
    loop: ~15 large contiguous ops per character instead of ~6W small
    ones.
    """
    n = len(shorts)
    ls = np.array([len(s) for s in shorts], dtype=np.int64)
    ll = np.array([len(s) for s in longs], dtype=np.int64)
    order = np.argsort(-ll, kind="stable")
    shorts = [shorts[i] for i in order]
    longs = [longs[i] for i in order]
    ls_s, ll_s = ls[order], ll[order]

    max_ls = int(ls_s.max())
    max_ll = int(ll_s.max())
    a_raw = _encode_padded(shorts, max_ls)
    b_raw = _encode_padded(longs, max_ll)

    # compact per-chunk alphabet (normalized text uses ~35 symbols): the
    # char->mask table shrinks ~4x, keeping the per-j random gather
    # L3-resident instead of cache-miss-bound. id 0 = padding / not-in-a
    # (always a zero mask).
    present = np.zeros(256, dtype=bool)
    present[a_raw.ravel()] = True
    present[0] = False
    alpha = np.flatnonzero(present)
    A = len(alpha) + 1
    lut = np.zeros(256, dtype=np.uint8)
    lut[alpha] = np.arange(1, A, dtype=np.uint8)
    a_ids = lut[a_raw]
    b_ids = lut[b_raw]

    # char -> bitmask tables, word-major: one [n, A] table per word so the
    # per-j gather is a fast 1-D take and every inner-loop op runs on
    # contiguous memory ([W, n] layout; column slices of [n, W] would
    # stride every op)
    rows = np.arange(n)
    pml = [np.zeros((n, A), dtype=np.uint64) for _ in range(W)]
    for p in range(max_ls):
        live = ls_s > p
        w, r = divmod(p, 64)
        bit = _ONE << np.uint64(r)
        idx = rows[live]
        pml[w][idx, a_ids[live, p]] |= bit
    pm_flat = [t.reshape(n * A) for t in pml]

    # per-row full mask (low ls bits across W words), word-major
    full = np.empty((W, n), dtype=np.uint64)
    for w in range(W):
        full[w] = _lowmask(ls_s - 64 * w)

    v = full.copy()
    row_off = (rows * A).astype(np.intp)
    # rows sorted by ll desc: row i is live while j < ll_s[i]; precompute
    # the live-prefix length for every j in one vectorized searchsorted
    acts = np.searchsorted(-ll_s, -(np.arange(max_ll) + 1), side="right")
    # preallocated per-j temporaries (the loop is memory/alloc bound)
    idx_b = np.empty(n, dtype=np.intp)
    m_b = np.empty((W, n), dtype=np.uint64)
    t_b = np.empty((W, n), dtype=np.uint64)
    x_b = np.empty((W, n), dtype=np.uint64)
    s_b = np.empty(n, dtype=np.uint64)
    c1_b = np.empty(n, dtype=bool)
    c2_b = np.empty(n, dtype=bool)
    cr_b = np.empty(n, dtype=bool)
    # NOTE on masking: only the TOP word has a partial mask (lower words
    # are all-ones). Add-carry junk above ls in the top word propagates
    # only UPWARD (never into significant low bits, never into another
    # word — carry out of the top word is dropped), and char masks have
    # no bits there, so the significant bits evolve exactly as if masked
    # every iteration. Mask ONCE after the loop — saves a full [act, W]
    # pass per character.
    for j in range(max_ll):
        act = int(acts[j])
        if act == 0:
            break
        idx = idx_b[:act]
        np.add(row_off[:act], b_ids[:act, j], out=idx)
        va = v[:, :act]
        m = m_b[:, :act]
        t = t_b[:, :act]
        x = x_b[:, :act]
        for w in range(W):
            np.take(pm_flat[w], idx, out=m[w])
        np.bitwise_and(va, m, out=t)
        # t is a submask of v, so v - t == v ^ t: no borrow chain needed;
        # only the addition carries across words.
        np.bitwise_xor(va, t, out=x)
        if W == 1:
            s = s_b[:act]
            np.add(va[0], t[0], out=s)
            np.bitwise_or(s, x[0], out=va[0])
        else:
            s = s_b[:act]
            c1, c2, carry = c1_b[:act], c2_b[:act], cr_b[:act]
            for w in range(W):
                vw, tw = va[w], t[w]
                np.add(vw, tw, out=s)
                np.less(s, vw, out=c1)
                if w:
                    # bool carry upcasts to uint64 in the add/compare
                    np.add(s, carry, out=s, casting="unsafe")
                    np.less(s, carry, out=c2)
                    np.logical_or(c1, c2, out=carry)
                else:
                    carry[...] = c1
                vw[...] = s
            np.bitwise_or(va, x, out=va)

    np.bitwise_and(v, full, out=v)
    # per-pair popcount over the W words (word-major layout)
    ones = _POP[v.view(np.uint8).reshape(W, n, 8)].sum(axis=(0, 2))
    lcs = ls_s - ones.astype(np.int64)
    dist_sorted = ll_s - ls_s + 2 * (ls_s - lcs)
    dist = np.empty(n, dtype=np.int64)
    dist[order] = dist_sorted
    return dist


def batch_indel_distance(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """InDel distances for arbitrary non-trivial ASCII pairs.

    Caller contract (enforced by ``batch_component_scores``): both sides
    non-empty, a != b, clean ASCII.  Groups by word width of the shorter
    side and chunks each group to bound the mask-table memory.
    """
    n = len(a_list)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    shorts: list[str] = []
    longs: list[str] = []
    for a, b in zip(a_list, b_list):
        if len(a) <= len(b):
            shorts.append(a)
            longs.append(b)
        else:
            shorts.append(b)
            longs.append(a)
    widths = np.array([(len(s) + 63) >> 6 for s in shorts], dtype=np.int64)
    order = np.argsort(widths, kind="stable")
    # pack W-sorted jobs into large chunks, padding each job's width up to
    # the chunk max: numpy dispatch overhead at small row counts costs
    # more than the padded dead words (adjacent Ws, so padding is small)
    i = 0
    while i < n:
        j = i
        W = 0
        w_min = int(widths[order[i]])
        while j < n:
            w = int(widths[order[j]])
            # chunk W is the running max (sorted ascending -> current w);
            # merge at most 2 adjacent widths — padding waste beyond that
            # costs more than the dispatch overhead it saves
            if j > i and (
                (j - i + 1) * w > _CHUNK_WORD_ROWS
                or w > w_min + _MERGE_WIDTHS - 1
            ):
                break
            W = w
            j += 1
        idx = order[i:j]
        out[idx] = _chunk_indel_distance(
            [shorts[k] for k in idx], [longs[k] for k in idx], W
        )
        i = j
    return out


def _batch_jaro_counts(
    a_list: list[str], b_list: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """(match count m, transposition count t) per pair — the integers of
    ``kernels.jaro``'s greedy, batched. Caller contract: both sides
    non-empty ASCII, len <= 128 (two uint64 words)."""
    n = len(a_list)
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    max_la = int(la.max())
    a_raw = _encode_padded(a_list, max_la)
    b_raw = _encode_padded(b_list, int(lb.max()))

    # compact alphabet over b (the mask string); a-chars absent from b
    # (and padding) map to id 0 = zero mask
    present = np.zeros(256, dtype=bool)
    present[b_raw.ravel()] = True
    present[0] = False
    alpha = np.flatnonzero(present)
    A = len(alpha) + 1
    lut = np.zeros(256, dtype=np.uint8)
    lut[alpha] = np.arange(1, A, dtype=np.uint8)
    a_ids = lut[a_raw]
    b_ids = lut[b_raw]

    rows = np.arange(n)
    pm0 = np.zeros((n, A), dtype=np.uint64)
    pm1 = np.zeros((n, A), dtype=np.uint64)
    for p in range(int(lb.max())):
        live = lb > p
        bit = _ONE << np.uint64(p % 64)
        tgt = pm0 if p < 64 else pm1
        tgt[rows[live], b_ids[live, p]] |= bit

    mw = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    un0 = _lowmask(lb)
    un1 = _lowmask(lb - 64)
    init0, init1 = un0.copy(), un1.copy()
    fl = np.zeros((n, 2), dtype=np.uint64)  # flagged a positions
    m_cnt = np.zeros(n, dtype=np.int64)

    # lowmask lookup tables over bit-counts 0..129 (strings <= 128 chars):
    # one table per word — cheaper than recomputing clip/shift chains per i
    ks = np.arange(130)
    low0 = _lowmask(ks)
    low1 = _lowmask(ks - 64)

    for i in range(max_la):
        act = la > i
        lo = np.maximum(i - mw, 0)
        hi1 = np.minimum(i + mw, lb - 1) + 1
        w0 = low0[hi1] & ~low0[lo]
        w1 = low1[hi1] & ~low1[lo]
        cid = a_ids[:, i]
        c0 = pm0[rows, cid] & w0 & un0
        c1 = pm1[rows, cid] & w1 & un1
        use1 = c0 == _ZERO
        l0 = np.where(use1, _ZERO, c0 & (_ZERO - c0))
        l1 = np.where(use1, c1 & (_ZERO - c1), _ZERO)
        hit = act & ((l0 | l1) != _ZERO)
        l0 = np.where(hit, l0, _ZERO)
        l1 = np.where(hit, l1, _ZERO)
        un0 &= ~l0
        un1 &= ~l1
        bit = _ONE << np.uint64(i % 64)
        fl[:, i // 64] |= np.where(hit, bit, _ZERO)
        m_cnt += hit

    # pass 2: pop matched b-positions ascending against a's matched chars
    rem0 = init0 ^ un0
    rem1 = init1 ^ un1
    t_cnt = np.zeros(n, dtype=np.int64)
    for i in range(max_la):
        af = (fl[:, i // 64] >> np.uint64(i % 64)) & _ONE != _ZERO
        if not af.any():
            continue
        use1 = rem0 == _ZERO
        l0 = np.where(use1, _ZERO, rem0 & (_ZERO - rem0))
        l1 = np.where(use1, rem1 & (_ZERO - rem1), _ZERO)
        cid = a_ids[:, i]
        eq = ((pm0[rows, cid] & l0) | (pm1[rows, cid] & l1)) != _ZERO
        t_cnt += af & ~eq
        rem0 &= ~np.where(af, l0, _ZERO)
        rem1 &= ~np.where(af, l1, _ZERO)
    return m_cnt, t_cnt


def batch_jaro_winkler(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Jaro-Winkler x1 for ASCII pairs; float formulas in
    ``kernels.jaro`` / ``kernels.jaro_winkler``'s exact op order.

    Inputs are truncated to ``_JARO_PREFIX`` (128) chars INSIDE this
    function: the two-word bitmask layout in ``_batch_jaro_counts`` is
    silently wrong past 128 chars, and 128 is exactly the prefix the
    per-pair oracle kernel scores (``oracle.JARO_PREFIX``) — so the
    public function is safe at any length and stays the oracle's twin
    (round-3 ADVICE)."""
    a_list = [s[:_JARO_PREFIX] if s and len(s) > _JARO_PREFIX else s
              for s in a_list]
    b_list = [s[:_JARO_PREFIX] if s and len(s) > _JARO_PREFIX else s
              for s in b_list]
    n = len(a_list)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    # trivials per kernels.jaro / equal-string shortcut (algebraically 1.0)
    hard_idx: list[int] = []
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        if a == b:
            out[i] = 1.0
        elif not a or not b:
            out[i] = 0.0 if (a or b) else 1.0
        else:
            hard_idx.append(i)
    if not hard_idx:
        return out
    ha = [a_list[i] for i in hard_idx]
    hb = [b_list[i] for i in hard_idx]
    m, t = _batch_jaro_counts(ha, hb)
    la = np.array([len(s) for s in ha], dtype=np.float64)
    lb = np.array([len(s) for s in hb], dtype=np.float64)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        th = t.astype(np.float64) / 2.0
        j = (mf / la + mf / lb + (mf - th) / mf) / 3.0
    j = np.where(m == 0, 0.0, j)
    # common-prefix length (cap 4), padding-safe
    la_i = la.astype(np.int64)
    lb_i = lb.astype(np.int64)
    a4 = _encode_padded([s[:4] for s in ha], 4)
    b4 = _encode_padded([s[:4] for s in hb], 4)
    pos = np.arange(4)
    valid = (pos < la_i[:, None]) & (pos < lb_i[:, None])
    eq = (a4 == b4) & valid
    pref = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    jw = j + (pref * 0.1) * (1.0 - j)
    out[hard_idx] = jw
    return out


# ---------------------------------------------------------------------------
# channel assembly — the batched twin of pipeline.oracle.component_scores
# ---------------------------------------------------------------------------

_JARO_PREFIX = 128  # == pipeline.oracle.JARO_PREFIX (asserted in tests)


def batch_component_scores(
    norm_a: list[str | None],
    norm_b: list[str | None],
    roles_a: list[str | None],
    roles_b: list[str | None],
    cfg: MatchConfig = DEFAULT_CONFIG,
) -> dict[str, np.ndarray]:
    """Vectorized twin of ``oracle.component_scores`` over a batch.

    Returns {channel: float64 ndarray}. Per-pair trivial cases (equality,
    absent channels) are decided inline exactly as the oracle does; every
    non-trivial InDel goes through one flat ``batch_indel_distance`` call
    and every non-trivial Jaro through ``batch_jaro_winkler``. Non-ASCII
    rows fall back to the per-pair oracle kernels wholesale.
    """
    from pipeline.oracle import component_scores  # lazy: avoid cycle

    n = len(norm_a)
    # small batches are numpy-dispatch-overhead-bound (measured crossover
    # ~600 pairs: batch 540 us/pair vs per-pair 440 at n=400, but 234 vs
    # 333 at n=1600): fall through to the per-pair kernels below the
    # crossover — both paths are bit-equal, so dispatch is free to choose
    if n < _BATCH_MIN_ROWS:
        cols: dict[str, list[float]] = {c: [] for c in (
            "token_sort", "num", "partial", "jaccard", "jaro", "struct", "text"
        )}
        cap0 = cfg.score_text_max_chars
        for a, b, ra, rb in zip(norm_a, norm_b, roles_a, roles_b):
            s = component_scores(
                (a or "")[:cap0], (b or "")[:cap0], ra or "", rb or "", cfg
            )
            for c, v in s.items():
                cols[c].append(v)
        return {c: np.asarray(v, dtype=np.float64) for c, v in cols.items()}
    cap = cfg.score_text_max_chars
    ts = np.empty(n, dtype=np.float64)
    num = np.empty(n, dtype=np.float64)
    partial = np.zeros(n, dtype=np.float64)
    jacc = np.empty(n, dtype=np.float64)
    jaro_s = np.empty(n, dtype=np.float64)
    struct = np.empty(n, dtype=np.float64)
    text = np.empty(n, dtype=np.float64)

    # flat InDel job lists: strings + (channel, row) scatter targets
    job_a: list[str] = []
    job_b: list[str] = []
    job_slot: list[int] = []  # row index
    job_chan: list[int] = []  # 0=ts 1=num 2=partial(max) 3=struct 4=text
    jaro_a: list[str] = []
    jaro_b: list[str] = []
    jaro_slot: list[int] = []

    def _add(chan: int, row: int, a: str, b: str) -> None:
        job_a.append(a)
        job_b.append(b)
        job_slot.append(row)
        job_chan.append(chan)

    for i in range(n):
        a = (norm_a[i] or "")[:cap]
        b = (norm_b[i] or "")[:cap]
        ra = roles_a[i] or ""
        rb = roles_b[i] or ""
        if not (
            _clean_ascii(a)
            and _clean_ascii(b)
            and _clean_ascii(ra)
            and _clean_ascii(rb)
        ):
            s = component_scores(a, b, ra, rb, cfg)
            ts[i] = s["token_sort"]
            num[i] = s["num"]
            partial[i] = s["partial"]
            jacc[i] = s["jaccard"]
            jaro_s[i] = s["jaro"]
            struct[i] = s["struct"]
            text[i] = s["text"]
            continue

        eq = a == b
        # street channel: exact-normalized or sorted-equal -> 100
        sa = kernels.sorted_form(a)
        sb = kernels.sorted_form(b)
        if eq or sa == sb:
            ts[i] = 100.0
        elif not sa or not sb:
            # indel_ratio one-side-empty trivial (both-empty -> sa == sb)
            ts[i] = 0.0
        else:
            _add(0, i, sa, sb)

        # house channel: digit-run signature through the F9 ladder
        da, db = kernels.digit_sig(a), kernels.digit_sig(b)
        if not da or not db:
            num[i] = 0.0
        elif da == db:
            num[i] = 100.0
        else:
            _add(1, i, da, db)

        # city channel: partial_ratio over the shared window set
        if eq:
            partial[i] = 100.0
        elif not a or not b:
            partial[i] = 0.0
        else:
            shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
            if len(shorter) == len(longer):
                _add(2, i, shorter, longer)
            else:
                for start in kernels.partial_windows(shorter, longer):
                    win = longer[start : start + len(shorter)]
                    if shorter == win:
                        partial[i] = 100.0
                        break
                    _add(2, i, shorter, win)

        # zip channel: token-set Jaccard x100 (cached per doc text)
        jacc[i] = 100.0 * kernels.token_set_jaccard(a, b)

        # state channel: Jaro-Winkler x100 on the 128-char prefix
        jaro_a.append(a[:_JARO_PREFIX])
        jaro_b.append(b[:_JARO_PREFIX])
        jaro_slot.append(i)

        # unit channel: role-signature similarity
        if ra == rb:
            struct[i] = 100.0
        elif not ra or not rb:
            # indel_ratio of an empty side: both empty -> 100, one -> 0
            struct[i] = 100.0 if (not ra and not rb) else 0.0
        else:
            _add(3, i, ra, rb)

        # overall similarity: plain InDel, exact-first
        if eq:
            text[i] = 100.0
        elif not a or not b:
            text[i] = 100.0 if (not a and not b) else 0.0
        else:
            _add(4, i, a, b)

    if job_a:
        dist = batch_indel_distance(job_a, job_b)
        tot = np.array(
            [len(x) + len(y) for x, y in zip(job_a, job_b)], dtype=np.float64
        )
        ratio = 100.0 * (1.0 - dist.astype(np.float64) / tot)
        chan = np.array(job_chan, dtype=np.int64)
        slot = np.array(job_slot, dtype=np.int64)
        for c, dest in ((0, ts), (3, struct), (4, text)):
            sel = chan == c
            dest[slot[sel]] = ratio[sel]
        sel = chan == 1
        r = ratio[sel]
        num[slot[sel]] = np.where(r >= 90.0, r, np.maximum(0.0, r - 20.0))
        sel = chan == 2
        np.maximum.at(partial, slot[sel], ratio[sel])

    if jaro_a:
        jw = batch_jaro_winkler(jaro_a, jaro_b)
        jaro_s[np.array(jaro_slot, dtype=np.int64)] = 100.0 * jw

    return {
        "token_sort": ts,
        "num": num,
        "partial": partial,
        "jaccard": jacc,
        "jaro": jaro_s,
        "struct": struct,
        "text": text,
    }
