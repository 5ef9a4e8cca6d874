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

        vocab_ids = jnp.arange(vocab, dtype=jnp.int32)

        def step(state, lp_t):
            prefixes, lengths, scores, last, h1, h2 = state

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
            new_len = p_len + p_extends.astype(jnp.int32)

            # Prefix buffer: copy parent, scatter the new token at p_len
            # where extended.
            new_prefixes = prefixes[parent]
            pos = jnp.arange(t_len, dtype=jnp.int32)[None, :]
            write = (pos == p_len[:, None]) & p_extends[:, None]
            new_prefixes = jnp.where(write, tok[:, None], new_prefixes)

            return (new_prefixes, new_len, new_scores, new_last, new_h1, new_h2), None

        state = (prefixes, lengths, scores, last, h1, h2)
        (prefixes, lengths, scores, last, h1, h2), _ = jax.lax.scan(
            step, state, lp
        )

        # Sort final beams by score, best first (reference decode.py:205-208).
        order = jnp.argsort(-scores)
        return prefixes[order], lengths[order], scores[order]

    return jax.vmap(per_item)(log_probs)


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
