"""Vectorized on-device CTC beam search.

JAX reimplementation of the reference's prefix beam search
(reference decode.py:128-217) with identical semantics — hypotheses keyed
by (prefix); max-merge (not logsumexp) of hypotheses that collapse to the
same prefix; the surviving hypothesis carries its own last token — but
batched and compiled: the per-step work is (beams x vocab) tensor ops +
one sort, instead of a Python dict loop (O(L*V*beam) interpreter time).

Prefix identity is tracked with two independent 32-bit rolling hashes;
a collision would need both to collide simultaneously (~2^-64 per pair).
Prefix token storage is a (beams, T) buffer updated by masked scatter.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30

_P1 = jnp.uint32(1000003)
_P2 = jnp.uint32(998244353)


def _beam_frame_step(state: Tuple, lp_t: jnp.ndarray, blank_token: int,
                     t=None, track: Tuple = None):
    """One frame of the prefix beam, on per-item (k, ...) state arrays.

    state = (prefixes (k, cap), lengths, scores, last, h1, h2); the prefix
    buffer capacity `cap` is whatever the caller allocated (the one-shot
    search uses cap = T; the streaming resume path keeps a smaller rolling
    buffer and commits the beams' common prefix out of it).

    track (optional, with `t` the absolute frame index) carries per-token
    frame spans + log posteriors along each hypothesis's own trajectory:
    (starts, ends, lp_sum, lp_n) each (k, cap) aligned with the prefix
    buffer, plus (tail_end, tail_lp, tail_n) each (k,) for frames that
    extend the last COMMITTED token (its slot was shifted out by
    beam_commit, so the run continuation has nowhere else to land). Span
    semantics match the greedy collapse exactly when the hypothesis's
    per-frame choices match the argmax: start = emission frame, end =
    last consecutive frame of the token + 1 (a repeat keeps the run
    open; blank freezes it) — this is what lets --timestamps compose
    with the beam (VERDICT r4 item 7).

    Returns (new_state, dropped, new_track) where `dropped` is a scalar
    bool: some kept hypothesis tried to extend past `cap`. Lengths are
    clamped to `cap` so buffer content and lengths stay consistent —
    overflow degrades to clean truncation (no -1 padding slots ever fall
    inside a reported length), and the caller surfaces `dropped` as
    state["overflow"].
    """
    prefixes, lengths, scores, last, h1, h2 = state
    k, cap = prefixes.shape
    vocab = lp_t.shape[0]
    vocab_ids = jnp.arange(vocab, dtype=jnp.int32)

    # Candidate grid (k, vocab).
    cand_scores = scores[:, None] + lp_t[None, :]
    is_blank = vocab_ids[None, :] == blank_token
    extends = (~is_blank) & (vocab_ids[None, :] != last[:, None])

    v32 = vocab_ids.astype(jnp.uint32)[None, :]
    c_h1 = jnp.where(extends, h1[:, None] * _P1 + v32 + 1, h1[:, None])
    c_h2 = jnp.where(extends, h2[:, None] * _P2 + v32 + 1, h2[:, None])

    flat_scores = cand_scores.reshape(-1)
    flat_h1 = c_h1.reshape(-1)
    flat_h2 = c_h2.reshape(-1)

    # Max-merge candidates sharing a prefix: sort by (h1, h2, -score),
    # keep only the first (= best) of each hash group.
    order = jnp.lexsort((-flat_scores, flat_h2, flat_h1))
    s_h1 = flat_h1[order]
    s_h2 = flat_h2[order]
    s_scores = flat_scores[order]
    first = jnp.concatenate(
        [
            jnp.array([True]),
            (s_h1[1:] != s_h1[:-1]) | (s_h2[1:] != s_h2[:-1]),
        ]
    )
    merged_scores = jnp.where(first, s_scores, NEG_INF)

    # Prune to beam width.
    top_scores, top_pos = jax.lax.top_k(merged_scores, k)
    sel = order[top_pos]  # flat candidate index
    parent = sel // vocab
    tok = (sel % vocab).astype(jnp.int32)

    new_scores = top_scores
    new_h1 = flat_h1[sel]
    new_h2 = flat_h2[sel]
    new_last = tok
    p_len = lengths[parent]
    p_extends = (tok != blank_token) & (tok != last[parent])
    new_len_raw = p_len + p_extends.astype(jnp.int32)
    dropped = jnp.any(new_len_raw > cap)
    new_len = jnp.minimum(new_len_raw, cap)

    # Prefix buffer: copy parent, scatter the new token at p_len
    # where extended (a p_len == cap write position matches no slot, so
    # the token is dropped and new_len stays clamped at cap).
    new_prefixes = prefixes[parent]
    pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
    write = (pos == p_len[:, None]) & p_extends[:, None]
    new_prefixes = jnp.where(write, tok[:, None], new_prefixes)

    new_state = (new_prefixes, new_len, new_scores, new_last, new_h1, new_h2)
    new_track = None
    if track is not None:
        starts, ends, lp_sum, lp_n, tail_end, tail_lp, tail_n = track
        t32 = jnp.asarray(t, jnp.int32)
        chosen_lp = lp_t[tok]  # (k,) log posterior of each kept choice
        # A repeat of the parent's last token keeps that token's run open
        # (greedy-collapse semantics along this hypothesis's trajectory).
        is_rep = (tok != blank_token) & (tok == last[parent])
        write_rep = (pos == (p_len - 1)[:, None]) & is_rep[:, None]
        p_starts, p_ends = starts[parent], ends[parent]
        p_lp_sum, p_lp_n = lp_sum[parent], lp_n[parent]
        new_starts = jnp.where(write, t32, p_starts)
        new_ends = jnp.where(write | write_rep, t32 + 1, p_ends)
        new_lp_sum = jnp.where(
            write, chosen_lp[:, None],
            jnp.where(write_rep, p_lp_sum + chosen_lp[:, None], p_lp_sum),
        )
        new_lp_n = jnp.where(
            write, 1, jnp.where(write_rep, p_lp_n + 1, p_lp_n)
        )
        # Repeat with an EMPTY suffix buffer: the run continues the last
        # committed token — record it in the tail so the host can extend
        # that token's already-emitted span.
        rep_tail = is_rep & (p_len == 0)
        new_tail_end = jnp.where(rep_tail, t32 + 1, tail_end[parent])
        new_tail_lp = jnp.where(rep_tail, tail_lp[parent] + chosen_lp,
                                tail_lp[parent])
        new_tail_n = jnp.where(rep_tail, tail_n[parent] + 1, tail_n[parent])
        new_track = (new_starts, new_ends, new_lp_sum, new_lp_n,
                     new_tail_end, new_tail_lp, new_tail_n)

    return new_state, dropped, new_track


@functools.partial(jax.jit, static_argnames=("beam_width", "blank_token"))
def ctc_beam_search_jax(
    logits: jnp.ndarray,
    beam_width: int = 10,
    blank_token: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched beam search.

    Args:
        logits: (batch, T, vocab) unnormalized.

    Returns:
        tokens: (batch, beam_width, T) int32, -1 padded, best beam first.
        lengths: (batch, beam_width) int32.
        scores: (batch, beam_width) float32 (log-prob, max-merge semantics).
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    batch, t_len, vocab = log_probs.shape
    k = beam_width

    def per_item(lp):
        # Beam state: prefix buffer, length, score, last token, two hashes.
        prefixes = jnp.full((k, t_len), -1, jnp.int32)
        lengths = jnp.zeros((k,), jnp.int32)
        scores = jnp.full((k,), NEG_INF, jnp.float32).at[0].set(0.0)
        last = jnp.full((k,), -1, jnp.int32)  # reference inits last=None
        h1 = jnp.zeros((k,), jnp.uint32)
        h2 = jnp.zeros((k,), jnp.uint32)

        def step(state, lp_t):
            new, _, _ = _beam_frame_step(state, lp_t, blank_token)
            return new, None  # cap == T: one-shot search cannot overflow

        state = (prefixes, lengths, scores, last, h1, h2)
        (prefixes, lengths, scores, last, h1, h2), _ = jax.lax.scan(
            step, state, lp
        )

        # Sort final beams by score, best first (reference decode.py:205-208).
        order = jnp.argsort(-scores)
        return prefixes[order], lengths[order], scores[order]

    return jax.vmap(per_item)(log_probs)


def beam_state_init(batch: int, beam_width: int, cap: int) -> dict:
    """Carried beam state for chunkwise (streaming) beam search.

    A pytree of (batch, beam_width, ...) arrays; `cap` is the prefix-buffer
    capacity in tokens. ctc_beam_resume advances it over one chunk of
    logits; beam_commit emits the beams' common prefix and shifts it out so
    a live stream's buffer stays bounded. Rows are kept sorted best-first
    by the per-frame top_k, so row 0 is always the current best hypothesis.
    """
    k = beam_width
    return {
        "prefixes": jnp.full((batch, k, cap), -1, jnp.int32),
        "lengths": jnp.zeros((batch, k), jnp.int32),
        "scores": jnp.full((batch, k), NEG_INF, jnp.float32).at[:, 0].set(0.0),
        "last": jnp.full((batch, k), -1, jnp.int32),
        "h1": jnp.zeros((batch, k), jnp.uint32),
        "h2": jnp.zeros((batch, k), jnp.uint32),
        # Per-token frame spans + log posteriors along each hypothesis
        # (see _beam_frame_step `track`) — what makes ?beam=N compose
        # with ?timestamps=1 on the live path.
        "starts": jnp.zeros((batch, k, cap), jnp.int32),
        "ends": jnp.zeros((batch, k, cap), jnp.int32),
        "lp_sum": jnp.zeros((batch, k, cap), jnp.float32),
        "lp_n": jnp.zeros((batch, k, cap), jnp.int32),
        "tail_end": jnp.zeros((batch, k), jnp.int32),
        "tail_lp": jnp.zeros((batch, k), jnp.float32),
        "tail_n": jnp.zeros((batch, k), jnp.int32),
        # Set if any hypothesis ever tried to write past `cap` (tokens were
        # dropped); hosts should treat the transcript as truncated.
        "overflow": jnp.zeros((batch,), bool),
    }


_RESUME_KEYS = ("prefixes", "lengths", "scores", "last", "h1", "h2",
                "starts", "ends", "lp_sum", "lp_n",
                "tail_end", "tail_lp", "tail_n", "overflow")


@functools.partial(jax.jit, static_argnames=("blank_token",))
def ctc_beam_resume(
    state: dict, logits: jnp.ndarray, valid: jnp.ndarray,
    blank_token: int = 0, frame_base: jnp.ndarray = None
) -> dict:
    """Advance carried beam state over one chunk of logits.

    The frames processed are exactly the reference prefix-beam recurrence
    (reference decode.py:128-217, max-merge) — running N chunks through
    this function equals one ctc_beam_search_jax call over the
    concatenated valid frames (tests/test_beam_stream.py).

    Args:
        state: beam_state_init pytree, (batch, k, ...).
        logits: (batch, T_chunk, vocab) unnormalized.
        valid: (batch,) int32 — frames [0, valid) of each row are real;
            the rest leave that row's beams untouched (padding chunks of
            shorter utterances in a batched stream group).
        frame_base: optional (batch,) int32 — each row's absolute output
            frame index of this chunk's first frame; recorded spans
            (state["starts"]/["ends"]) are absolute. Defaults to 0.
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t_chunk = lp.shape[1]
    if frame_base is None:
        frame_base = jnp.zeros((lp.shape[0],), jnp.int32)

    def per_item(prefixes, lengths, scores, last, h1, h2,
                 starts, ends, lp_sum, lp_n, tail_end, tail_lp, tail_n,
                 overflow, lp_i, v, base):
        def step(carry, inp):
            lp_t, t = inp
            st, trk = carry[:6], carry[6:13]
            # `dropped`: a kept hypothesis extended while its buffer was
            # already full — the scatter dropped the token and the length
            # was clamped at cap (clean truncation).
            new, dropped, new_trk = _beam_frame_step(
                st, lp_t, blank_token, t=base + t, track=trk
            )
            active = t < v
            merged = tuple(
                jnp.where(active, n, o)
                for n, o in zip(new + new_trk, st + trk)
            )
            ov = carry[13] | (active & dropped)
            return merged + (ov,), None

        init = (prefixes, lengths, scores, last, h1, h2,
                starts, ends, lp_sum, lp_n, tail_end, tail_lp, tail_n,
                overflow)
        out, _ = jax.lax.scan(
            step, init, (lp_i, jnp.arange(t_chunk, dtype=jnp.int32))
        )
        return out

    out = jax.vmap(per_item)(
        *(state[k] for k in _RESUME_KEYS), lp, valid, frame_base,
    )
    return dict(zip(_RESUME_KEYS, out))


@jax.jit
def beam_commit(state: dict) -> Tuple[dict, jnp.ndarray, jnp.ndarray]:
    """Emit the longest common prefix of the live beams and shift it out.

    All future hypotheses descend from the current beams, so tokens shared
    by every live beam can never be retracted — they are final, and a live
    stream can emit them immediately. Shifting them out of the prefix
    buffer keeps a long-running session's state bounded (the divergence
    window between beams is short in practice).

    Returns (new_state, ncommit (batch,), info) where info is a dict of
    committed data from the best beam (which all live beams agree with on
    the committed span): "tokens"/"starts"/"ends"/"lp_sum"/"lp_n" each
    (batch, cap) with the first ncommit entries meaningful, plus
    "tail_end"/"tail_lp"/"tail_n" (batch,) — frames since the LAST commit
    that extended the previously committed token's run (the host extends
    that token's span/posterior; tails reset on every commit).
    """

    def per_item(prefixes, lengths, scores, last, h1, h2,
                 starts, ends, lp_sum, lp_n, tail_end, tail_lp, tail_n,
                 overflow):
        k, cap = prefixes.shape
        live = scores > NEG_INF / 2
        ref = prefixes[0]  # rows are sorted best-first; row 0 is live
        big = jnp.int32(cap + 1)
        minlen = jnp.min(jnp.where(live, lengths, big))
        eq = (prefixes == ref[None, :]) | ~live[:, None]
        col_ok = jnp.all(eq, axis=0) & (
            jnp.arange(cap, dtype=jnp.int32) < minlen
        )
        c = jnp.sum(jnp.cumprod(col_ok.astype(jnp.int32)))

        def shift(buf, fill):
            padded = jnp.concatenate(
                [buf, jnp.full((k, cap), fill, buf.dtype)], axis=1
            )
            return jax.lax.dynamic_slice_in_dim(padded, c, cap, axis=1)

        new_prefixes = shift(prefixes, -1)
        new_lengths = jnp.maximum(lengths - c, 0)
        zeros_k = jnp.zeros_like(tail_end)
        new_state = (
            new_prefixes, new_lengths, scores, last, h1, h2,
            shift(starts, 0), shift(ends, 0),
            shift(lp_sum, 0), shift(lp_n, 0),
            zeros_k, jnp.zeros_like(tail_lp), zeros_k,
            overflow,
        )
        info = (ref, starts[0], ends[0], lp_sum[0], lp_n[0],
                tail_end[0], tail_lp[0], tail_n[0])
        return new_state + (c,) + info

    out = jax.vmap(per_item)(*(state[k] for k in _RESUME_KEYS))
    n = len(_RESUME_KEYS)
    info_keys = ("tokens", "starts", "ends", "lp_sum", "lp_n",
                 "tail_end", "tail_lp", "tail_n")
    return (dict(zip(_RESUME_KEYS, out[:n])), out[n],
            dict(zip(info_keys, out[n + 1 :])))


def beam_finalize(state: dict):
    """Pull final beams to host: per item, a list of (tokens, score) pairs
    for every live beam, best acoustic score first. Tokens are the
    UNCOMMITTED suffixes if beam_commit was used — the caller prepends its
    committed history."""
    prefixes = np.asarray(state["prefixes"])
    lengths = np.asarray(state["lengths"])
    scores = np.asarray(state["scores"])
    overflow = np.asarray(state["overflow"])
    out = []
    for b in range(prefixes.shape[0]):
        beams = [
            (prefixes[b, i, : lengths[b, i]].tolist(), float(scores[b, i]))
            for i in range(prefixes.shape[1])
            if scores[b, i] > NEG_INF / 2
        ]
        out.append(beams)
    return out, overflow


def beam_finalize_full(state: dict):
    """beam_finalize plus per-beam suffix frame spans and token log
    posteriors: per item, a list of dicts {"tokens", "score",
    "stamps" [(start, end), ...], "lp" [[lp_sum, n_frames], ...]} for
    every live beam (best first), and the (batch,) overflow flags.
    Spans are absolute output frames (frame_base fed to
    ctc_beam_resume)."""
    prefixes = np.asarray(state["prefixes"])
    lengths = np.asarray(state["lengths"])
    scores = np.asarray(state["scores"])
    starts = np.asarray(state["starts"])
    ends = np.asarray(state["ends"])
    lp_sum = np.asarray(state["lp_sum"])
    lp_n = np.asarray(state["lp_n"])
    out = []
    for b in range(prefixes.shape[0]):
        beams = []
        for i in range(prefixes.shape[1]):
            if scores[b, i] <= NEG_INF / 2:
                continue
            n = lengths[b, i]
            beams.append({
                "tokens": prefixes[b, i, :n].tolist(),
                "score": float(scores[b, i]),
                "stamps": [
                    (int(s), int(e))
                    for s, e in zip(starts[b, i, :n], ends[b, i, :n])
                ],
                "lp": [
                    [float(s), int(c)]
                    for s, c in zip(lp_sum[b, i, :n], lp_n[b, i, :n])
                ],
            })
        out.append(beams)
    return out, np.asarray(state["overflow"])


class StreamingBeam:
    """Chunk-carried beam search for B independent streams.

    Wraps beam_state_init/ctc_beam_resume/beam_commit/beam_finalize with
    host-side committed-token bookkeeping and optional n-best rescoring
    (LM shallow fusion / hotword boosting) at finalize — the same
    rescoring approximation the offline jax beam backend documents
    (decode.CTCDecoder.decode_beam_search).

    update() keeps everything on device (the chunk logits flow from the
    model's jitted step into the jitted beam resume without a host round
    trip); commit() costs one small host transfer and yields the newly
    FINALIZED tokens per stream (the common prefix of all live beams —
    monotone, never retracted); finalize() returns each stream's best full
    token sequence, rescored if scorers were given.
    """

    def __init__(self, batch: int, beam_width: int, cap: int = 256,
                 blank_token: int = 0, scorers=None):
        self.batch = batch
        self.beam_width = beam_width
        self.cap = cap
        self.blank_token = blank_token
        # [(scorer, weight)]: scorer exposes total_score(tokens) or
        # score(tokens) for whole-sequence scoring.
        self.scorers = scorers or []
        self.committed: List[List[int]] = [[] for _ in range(batch)]
        self._state = beam_state_init(batch, beam_width, cap)
        self.overflowed = False

    def reset(self) -> None:
        self.committed = [[] for _ in range(self.batch)]
        self._state = beam_state_init(self.batch, self.beam_width, self.cap)
        self.overflowed = False

    def update(self, logits, valid, frame_base=0) -> None:
        """Advance over one chunk. logits: (batch, T_chunk, vocab) device
        array; valid: int or (batch,) — frames beyond it are padding.
        frame_base (int or (batch,)): absolute output frame of this
        chunk's first frame, for span tracking (?beam + ?timestamps)."""
        v = jnp.full((self.batch,), valid, jnp.int32) if np.isscalar(valid) \
            else jnp.asarray(valid, jnp.int32)
        fb = jnp.full((self.batch,), frame_base, jnp.int32) \
            if np.isscalar(frame_base) else jnp.asarray(frame_base, jnp.int32)
        self._state = ctc_beam_resume(
            self._state, logits, v, blank_token=self.blank_token,
            frame_base=fb,
        )

    def commit(self) -> List[dict]:
        """Emit newly finalized tokens per stream (appended to
        self.committed) and shift them out of the device buffers.

        Returns one dict per stream: "tokens" (the newly committed ids),
        "stamps" [(start, end) absolute output frames], "lp"
        [[lp_sum, n_frames]] per token, and "tail" (end, lp_sum, n) —
        frames since the last commit that extended the PREVIOUSLY
        committed token's run (None if none)."""
        self._state, nc, info = beam_commit(self._state)
        nc = np.asarray(nc)
        info = {k: np.asarray(v) for k, v in info.items()}
        out = []
        for b in range(self.batch):
            n = nc[b]
            new = info["tokens"][b, :n].tolist()
            self.committed[b].extend(new)
            tail = None
            if info["tail_n"][b] > 0:
                tail = (int(info["tail_end"][b]),
                        float(info["tail_lp"][b]), int(info["tail_n"][b]))
            out.append({
                "tokens": new,
                "stamps": [
                    (int(s), int(e))
                    for s, e in zip(info["starts"][b, :n],
                                    info["ends"][b, :n])
                ],
                "lp": [
                    [float(s), int(c)]
                    for s, c in zip(info["lp_sum"][b, :n],
                                    info["lp_n"][b, :n])
                ],
                "tail": tail,
            })
        return out

    def finalize(self) -> List[List[int]]:
        """Best full token sequence per stream: committed prefix + the
        best live beam's suffix, ranked by acoustic score plus any
        configured rescorers over the full sequence."""
        beams, overflow = beam_finalize(self._state)
        if np.asarray(overflow).any():
            self.overflowed = True
        return [
            rescore_pick_best(self.committed[b], beams[b], self.scorers)
            for b in range(self.batch)
        ]

    def finalize_full(self) -> List[dict]:
        """finalize() plus the chosen beam's suffix frame spans: one dict
        per stream {"tokens" (full sequence), "suffix_stamps",
        "suffix_lp"} — the suffix fields align with the tokens AFTER the
        committed prefix (the caller holds the committed spans from its
        commit() calls)."""
        beams_full, overflow = beam_finalize_full(self._state)
        if np.asarray(overflow).any():
            self.overflowed = True
        return [
            finalize_pick(self.committed[b], beams_full[b], self.scorers)
            for b in range(self.batch)
        ]


def rescore_pick_best(committed, beams, scorers, return_index: bool = False):
    """Pick the best full token sequence for one stream at finalize time.

    `committed` is the already-finalized prefix, `beams` the live
    (suffix tokens, acoustic score) n-best, `scorers` [(scorer, weight)]
    pairs applied to the FULL sequence (LM shallow fusion / hotword
    boosting) — the same rescoring approximation the offline jax beam
    backend documents (decode.CTCDecoder.decode_beam_search). Shared by
    StreamingBeam and the batched serve sessions whose beam state lives
    in a StreamSessionBatcher's stacked pytree.

    return_index=True also returns the chosen beam's index into `beams`
    (None if `beams` is empty), so the caller can pull that hypothesis's
    frame spans."""
    cands = [(i, list(committed) + suffix, ac)
             for i, (suffix, ac) in enumerate(beams)] \
        or [(None, list(committed), 0.0)]
    if scorers:
        def total(cand):
            _, toks, acoustic = cand
            t = acoustic
            for scorer, weight in scorers:
                fn = getattr(scorer, "total_score", None) or scorer.score
                t += weight * fn(toks)
            return t

        best = max(cands, key=total)
    else:
        best = max(cands, key=lambda p: p[2])
    if return_index:
        return best[1], best[0]
    return best[1]


def finalize_pick(committed, beams_full, scorers) -> dict:
    """rescore_pick_best over beam_finalize_full entries; returns
    {"tokens" (full sequence incl. committed), "suffix_stamps",
    "suffix_lp"} for the chosen hypothesis (empty span lists when no live
    beam exists)."""
    pairs = [(d["tokens"], d["score"]) for d in beams_full]
    tokens, idx = rescore_pick_best(committed, pairs, scorers,
                                    return_index=True)
    if idx is None:
        return {"tokens": tokens, "suffix_stamps": [], "suffix_lp": []}
    return {"tokens": tokens, "suffix_stamps": beams_full[idx]["stamps"],
            "suffix_lp": beams_full[idx]["lp"]}


def beams_to_token_lists(
    tokens: np.ndarray, lengths: np.ndarray
) -> List[List[List[int]]]:
    """(batch, k, T) padded buffers -> nested Python token lists."""
    out = []
    for b in range(tokens.shape[0]):
        out.append(
            [tokens[b, i, : lengths[b, i]].tolist() for i in range(tokens.shape[1])]
        )
    return out
