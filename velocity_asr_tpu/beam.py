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


def _beam_frame_step(state: Tuple, lp_t: jnp.ndarray, blank_token: int):
    """One frame of the prefix beam, on per-item (k, ...) state arrays.

    state = (prefixes (k, cap), lengths, scores, last, h1, h2); the prefix
    buffer capacity `cap` is whatever the caller allocated (the one-shot
    search uses cap = T; the streaming resume path keeps a smaller rolling
    buffer and commits the beams' common prefix out of it).

    Returns (new_state, dropped) where `dropped` is a scalar bool: some
    kept hypothesis tried to extend past `cap`. Lengths are clamped to
    `cap` so buffer content and lengths stay consistent — overflow
    degrades to clean truncation (no -1 padding slots ever fall inside a
    reported length), and the caller surfaces `dropped` as
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

    return (new_prefixes, new_len, new_scores, new_last, new_h1, new_h2), dropped


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
            new, _ = _beam_frame_step(state, lp_t, blank_token)
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
        # Set if any hypothesis ever tried to write past `cap` (tokens were
        # dropped); hosts should treat the transcript as truncated.
        "overflow": jnp.zeros((batch,), bool),
    }


@functools.partial(jax.jit, static_argnames=("blank_token",))
def ctc_beam_resume(
    state: dict, logits: jnp.ndarray, valid: jnp.ndarray, blank_token: int = 0
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
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t_chunk = lp.shape[1]

    def per_item(prefixes, lengths, scores, last, h1, h2, overflow, lp_i, v):
        def step(carry, inp):
            lp_t, t = inp
            st = carry[:6]
            # `dropped`: a kept hypothesis extended while its buffer was
            # already full — the scatter dropped the token and the length
            # was clamped at cap (clean truncation).
            new, dropped = _beam_frame_step(st, lp_t, blank_token)
            active = t < v
            merged = tuple(
                jnp.where(active, n, o) for n, o in zip(new, st)
            )
            ov = carry[6] | (active & dropped)
            return merged + (ov,), None

        init = (prefixes, lengths, scores, last, h1, h2, overflow)
        out, _ = jax.lax.scan(
            step, init, (lp_i, jnp.arange(t_chunk, dtype=jnp.int32))
        )
        return out

    out = jax.vmap(per_item)(
        state["prefixes"], state["lengths"], state["scores"], state["last"],
        state["h1"], state["h2"], state["overflow"], lp, valid,
    )
    keys = ("prefixes", "lengths", "scores", "last", "h1", "h2", "overflow")
    return dict(zip(keys, out))


@jax.jit
def beam_commit(state: dict) -> Tuple[dict, jnp.ndarray, jnp.ndarray]:
    """Emit the longest common prefix of the live beams and shift it out.

    All future hypotheses descend from the current beams, so tokens shared
    by every live beam can never be retracted — they are final, and a live
    stream can emit them immediately. Shifting them out of the prefix
    buffer keeps a long-running session's state bounded (the divergence
    window between beams is short in practice).

    Returns (new_state, ncommit (batch,), committed (batch, cap)) where
    committed[:, :ncommit] are the newly finalized tokens (from the best
    beam, which all live beams agree with on that span).
    """

    def per_item(prefixes, lengths, scores, last, h1, h2, overflow):
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

        padded = jnp.concatenate(
            [prefixes, jnp.full((k, cap), -1, jnp.int32)], axis=1
        )
        new_prefixes = jax.lax.dynamic_slice_in_dim(padded, c, cap, axis=1)
        new_lengths = jnp.maximum(lengths - c, 0)
        return (new_prefixes, new_lengths, scores, last, h1, h2, overflow,
                c, ref)

    out = jax.vmap(per_item)(
        state["prefixes"], state["lengths"], state["scores"], state["last"],
        state["h1"], state["h2"], state["overflow"],
    )
    keys = ("prefixes", "lengths", "scores", "last", "h1", "h2", "overflow")
    return dict(zip(keys, out[:7])), out[7], out[8]


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

    def update(self, logits, valid) -> None:
        """Advance over one chunk. logits: (batch, T_chunk, vocab) device
        array; valid: int or (batch,) — frames beyond it are padding."""
        v = jnp.full((self.batch,), valid, jnp.int32) if np.isscalar(valid) \
            else jnp.asarray(valid, jnp.int32)
        self._state = ctc_beam_resume(
            self._state, logits, v, blank_token=self.blank_token
        )

    def commit(self) -> List[List[int]]:
        """Emit newly finalized tokens per stream (appended to
        self.committed) and shift them out of the device buffers."""
        self._state, nc, toks = beam_commit(self._state)
        nc = np.asarray(nc)
        toks = np.asarray(toks)
        out = []
        for b in range(self.batch):
            new = toks[b, : nc[b]].tolist()
            self.committed[b].extend(new)
            out.append(new)
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


def rescore_pick_best(committed, beams, scorers) -> List[int]:
    """Pick the best full token sequence for one stream at finalize time.

    `committed` is the already-finalized prefix, `beams` the live
    (suffix tokens, acoustic score) n-best, `scorers` [(scorer, weight)]
    pairs applied to the FULL sequence (LM shallow fusion / hotword
    boosting) — the same rescoring approximation the offline jax beam
    backend documents (decode.CTCDecoder.decode_beam_search). Shared by
    StreamingBeam and the batched serve sessions whose beam state lives
    in a StreamSessionBatcher's stacked pytree."""
    cands = [(list(committed) + suffix, ac) for suffix, ac in beams] \
        or [(list(committed), 0.0)]
    if scorers:
        def total(pair):
            toks, acoustic = pair
            t = acoustic
            for scorer, weight in scorers:
                fn = getattr(scorer, "total_score", None) or scorer.score
                t += weight * fn(toks)
            return t

        return max(cands, key=total)[0]
    return max(cands, key=lambda p: p[1])[0]


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
