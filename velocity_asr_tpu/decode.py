"""CTC decoding (reference decode.py).

Greedy decoding is vectorized on-device (argmax + collapse mask + cumsum
scatter) instead of the reference's per-item Python loops
(decode.py:51-69); beam search is a host-side prefix beam with the
reference's max-merge semantics (decode.py:171-193), vectorized over the
vocabulary with numpy.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Default blank token index (reference decode.py:14).
BLANK_TOKEN = 0


@dataclass
class DecodingResult:
    """Result of CTC decoding (reference decode.py:17-24)."""

    text: str
    tokens: List[int]
    score: float
    timestamps: Optional[List[Tuple[int, int]]] = None


@functools.partial(jax.jit, static_argnames=("blank_token", "collapse_repeated"))
def ctc_greedy_decode_jax(
    logits: jnp.ndarray,
    blank_token: int = BLANK_TOKEN,
    collapse_repeated: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device greedy CTC decode.

    Semantics match reference decode.py:27-71: argmax per frame, drop
    blanks, collapse repeats (a blank resets the previous token, so a
    repeated token after a blank is kept).

    Returns:
        tokens: (batch, seq_len) int32, left-packed, padded with -1.
        lengths: (batch,) int32 number of emitted tokens.
    """
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    prev = jnp.pad(preds[:, :-1], ((0, 0), (1, 0)), constant_values=blank_token)
    keep = preds != blank_token
    if collapse_repeated:
        keep = keep & (preds != prev)

    positions = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)

    seq_len = preds.shape[1]
    out = jnp.full(preds.shape, -1, dtype=jnp.int32)
    # Scatter kept tokens to their packed positions; dropped tokens go to a
    # dump slot (seq_len - ... clipped writes are masked via mode="drop").
    scatter_pos = jnp.where(keep, positions, seq_len)
    batch_idx = jnp.arange(preds.shape[0])[:, None]
    out = out.at[batch_idx, scatter_pos].set(preds, mode="drop")
    return out, lengths


def ctc_greedy_decode(
    logits,
    blank_token: int = BLANK_TOKEN,
    collapse_repeated: bool = True,
) -> List[List[int]]:
    """Greedy CTC decode returning Python lists (reference decode.py:27-71)."""
    tokens, lengths = ctc_greedy_decode_jax(
        jnp.asarray(logits), blank_token=blank_token, collapse_repeated=collapse_repeated
    )
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    return [tokens[b, : lengths[b]].tolist() for b in range(tokens.shape[0])]


def ctc_greedy_decode_with_timestamps(
    logits,
    blank_token: int = BLANK_TOKEN,
) -> List[Tuple[List[int], List[Tuple[int, int]]]]:
    """Greedy decode with (start_frame, end_frame) per emitted token
    (reference decode.py:74-125).

    A token's span runs from its first frame to the frame where a blank or
    a different token appears (or seq_len for the final token).
    """
    preds = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))
    return timestamps_from_predictions(preds, blank_token)


def timestamps_from_predictions(
    preds: np.ndarray,
    blank_token: int = BLANK_TOKEN,
) -> List[Tuple[List[int], List[Tuple[int, int]]]]:
    """Timestamp extraction from per-frame argmax predictions (batch, T)."""
    batch, seq_len = preds.shape
    results = []
    for b in range(batch):
        pred = preds[b]
        # Emission frames: non-blank and != previous frame's token.
        prev = np.concatenate([[blank_token], pred[:-1]])
        keep = (pred != blank_token) & (pred != prev)
        starts = np.nonzero(keep)[0]
        tokens = pred[starts].tolist()
        # End frame: first index > start where token changes (or seq_len).
        change = np.concatenate([np.nonzero(pred[1:] != pred[:-1])[0] + 1, [seq_len]])
        ends = [int(change[np.searchsorted(change, s, side="right")]) for s in starts]
        timestamps = [(int(s), int(e)) for s, e in zip(starts, ends)]
        results.append((tokens, timestamps))
    return results


def frame_to_seconds(frame: int, hop_length: int, sample_rate: int) -> float:
    """Output frame -> seconds; output frames cover 2 hops after the stride-2
    temporal binding (reference scripts/transcribe.py:42-45)."""
    return frame * 2 * hop_length / sample_rate


def words_with_timestamps(tokens, stamps, vocabulary, hop_length, sample_rate,
                          token_logprobs=None):
    """Assemble word-level timings from char tokens + frame spans
    (reference scripts/transcribe.py:85-119).

    token_logprobs (optional, aligned with tokens): each token's mean
    per-frame log posterior over its span. When given, every word gets a
    "confidence" field — exp of the span-length-weighted mean log
    posterior of its content tokens (word-boundary space tokens are
    excluded, like the characters themselves).
    """
    import math

    words, current, start_t = [], [], None
    lp_sum = lp_n = 0.0

    def close(end_t):
        w = {"word": "".join(current), "start": start_t, "end": end_t}
        if token_logprobs is not None:
            w["confidence"] = math.exp(lp_sum / max(lp_n, 1.0))
        words.append(w)

    for i, (tok, (s, e)) in enumerate(zip(tokens, stamps)):
        ch = vocabulary[tok] if 0 <= tok < len(vocabulary) else "<unk>"
        # "▁" is the subword word-start marker: any token BEGINNING with it
        # closes the current word (decode._tokens_to_text maps "▁" to a
        # space, so "▁hel" "lo" "▁world" reads "hello world" — the
        # timestamps must split on the same rule).
        if ch == " " or ch.startswith("▁"):
            if current:
                close(frame_to_seconds(e, hop_length, sample_rate))
                current, start_t = [], None
                lp_sum = lp_n = 0.0
            if ch == " ":
                continue
            ch = ch.replace("▁", "")
            if not ch:
                continue
        elif "▁" in ch:
            # marker mid-token: strip it without forcing a word boundary
            ch = ch.replace("▁", "")
        if not current:
            start_t = frame_to_seconds(s, hop_length, sample_rate)
        current.append(ch)
        if token_logprobs is not None:
            n = max(e - s, 1)
            lp_sum += float(token_logprobs[i]) * n
            lp_n += n
        last_end = frame_to_seconds(e, hop_length, sample_rate)
    if current:
        close(last_end)
    return words


def token_logprobs_from_frames(frame_lp, stamps):
    """Mean per-frame log posterior per token span.

    frame_lp: (T,) log posterior of each frame's argmax token; stamps:
    (start, end) spans over the same axis (every frame in a span predicts
    that token, so the mean is the token's posterior)."""
    import numpy as np

    out = []
    for s, e in stamps:
        e = max(e, s + 1)
        out.append(float(np.mean(frame_lp[s:e])))
    return out


def align_tokens_to_frames(log_probs: np.ndarray, tokens: List[int],
                           blank_token: int = BLANK_TOKEN):
    """CTC Viterbi forced alignment of a token sequence to its logits.

    The offline beam+timestamps path (VERDICT r4 item 7): the beam (any
    backend, any LM) picks the token sequence, then the best CTC path
    emitting exactly that sequence assigns every frame to a token or
    blank. Each token's span is the contiguous frame run the path spends
    on it — identical to the greedy collapse spans whenever the Viterbi
    path matches the per-frame argmax (peaked models).

    Args:
        log_probs: (T, vocab) log posteriors (host numpy).
        tokens: the collapsed token sequence to align (no blanks).

    Returns (stamps, token_lp): [(start, end)] frame spans and each
    token's mean per-frame log posterior over its span. Empty tokens ->
    ([], []). Raises ValueError if the sequence cannot be emitted in T
    frames (needs T >= len + adjacent-duplicate count).
    """
    T = log_probs.shape[0]
    L = len(tokens)
    if L == 0:
        return [], []
    # Extended label sequence with optional blanks: [b, t1, b, t2, ..., b]
    ext = np.full(2 * L + 1, blank_token, np.int64)
    ext[1::2] = np.asarray(tokens, np.int64)
    S = ext.size
    need = L + sum(1 for i in range(1, L) if tokens[i] == tokens[i - 1])
    if T < need:
        raise ValueError(
            f"cannot align {L} tokens to {T} frames (needs >= {need})"
        )
    NEG = -1e30
    lp = np.asarray(log_probs, np.float32)[:, ext]  # (T, S)
    # Allowed predecessors: stay (s), advance (s-1), skip a blank (s-2,
    # only onto a non-blank that differs from the previous non-blank).
    skip_ok = np.zeros(S, bool)
    skip_ok[3::2] = ext[3::2] != ext[1:-2:2]
    alpha = np.full(S, NEG, np.float32)
    alpha[0] = lp[0, 0]
    if S > 1:
        alpha[1] = lp[0, 1]
    back = np.zeros((T, S), np.int8)  # 0=stay, 1=advance, 2=skip
    for t in range(1, T):
        stay = alpha
        adv = np.concatenate([[NEG], alpha[:-1]])
        skp = np.concatenate([[NEG, NEG], alpha[:-2]])
        skp = np.where(skip_ok, skp, NEG)
        choice = np.argmax(np.stack([stay, adv, skp]), axis=0)
        best = np.maximum(stay, np.maximum(adv, skp))
        back[t] = choice
        alpha = best + lp[t]
    # Path must end on the final blank or final token.
    s = S - 1 if alpha[S - 1] >= alpha[S - 2] else S - 2
    path = np.zeros(T, np.int64)
    for t in range(T - 1, -1, -1):
        path[t] = s
        s -= int(back[t, s])
    stamps, token_lp = [], []
    frame_lp = np.asarray(log_probs, np.float32)[np.arange(T), ext[path]]
    for i in range(L):
        s_idx = 2 * i + 1
        frames = np.nonzero(path == s_idx)[0]
        start, end = int(frames[0]), int(frames[-1]) + 1
        stamps.append((start, end))
        token_lp.append(float(frame_lp[frames].mean()))
    return stamps, token_lp


def _log_softmax_np(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def ctc_beam_search(
    logits,
    beam_width: int = 10,
    blank_token: int = BLANK_TOKEN,
    lm_weight: float = 0.0,
    lm_scorer: Optional[Any] = None,
) -> List[List[DecodingResult]]:
    """Prefix beam search with max-merge scoring (reference decode.py:128-217).

    Matches the reference's semantics exactly, including max-merge of
    hypotheses that map to the same (prefix, last-token-collapse) state —
    not logsumexp — and the optional external LM hook. The per-step vocab
    loop is vectorized with numpy.
    """
    log_probs = np.asarray(_log_softmax_np(np.asarray(jax.device_get(logits), np.float32)))
    batch_size, seq_len, vocab_size = log_probs.shape

    all_results: List[List[DecodingResult]] = []
    nonblank = np.array([t for t in range(vocab_size) if t != blank_token])

    for b in range(batch_size):
        # beams: prefix tuple -> (score, last_token)
        beams = {(): (0.0, None)}

        for t in range(seq_len):
            lp = log_probs[b, t]
            new_beams: dict = {}

            def offer(key, score, last):
                cur = new_beams.get(key)
                if cur is None or cur[0] < score:
                    new_beams[key] = (score, last)

            for prefix, (score, last_token) in beams.items():
                # Extend with blank: prefix unchanged, last token resets.
                offer(prefix, score + float(lp[blank_token]), blank_token)

                # Extend with every non-blank token (vectorized scores).
                token_scores = score + lp[nonblank]
                if lm_scorer is not None and lm_weight > 0:
                    for tok, ts in zip(nonblank, token_scores):
                        tok = int(tok)
                        key = prefix if last_token == tok else prefix + (tok,)
                        ts = float(ts) + lm_weight * lm_scorer.score(list(key))
                        offer(key, ts, tok)
                else:
                    for tok, ts in zip(nonblank.tolist(), token_scores.tolist()):
                        key = prefix if last_token == tok else prefix + (tok,)
                        offer(key, ts, tok)

            # Prune to beam width (reference decode.py:195-202).
            pruned = sorted(new_beams.items(), key=lambda kv: kv[1][0], reverse=True)
            beams = dict(pruned[:beam_width])

        results = [
            DecodingResult(text="", tokens=list(prefix), score=score)
            for prefix, (score, _) in sorted(
                beams.items(), key=lambda kv: kv[1][0], reverse=True
            )
        ]
        all_results.append(results)

    return all_results


class CTCDecoder:
    """Vocabulary-aware decoder wrapper (reference decode.py:220-327)."""

    def __init__(self, vocabulary: List[str], blank_token: int = BLANK_TOKEN):
        self.vocabulary = vocabulary
        self.blank_token = blank_token
        self.vocab_size = len(vocabulary)
        self.token_to_idx = {token: idx for idx, token in enumerate(vocabulary)}

    def decode_greedy(self, logits, collapse_repeated: bool = True) -> List[str]:
        token_sequences = ctc_greedy_decode(
            logits, blank_token=self.blank_token, collapse_repeated=collapse_repeated
        )
        return [self._tokens_to_text(tokens) for tokens in token_sequences]

    def decode_beam_search(
        self,
        logits,
        beam_width: int = 10,
        return_all_beams: bool = False,
        backend: str = "jax",
        lm_scorer: Optional[Any] = None,
        lm_weight: float = 0.0,
    ):
        """Beam decode. backend="jax" runs the batched on-device beam
        (velocity_asr_tpu.beam); "host" runs the numpy prefix beam with
        bit-identical reference semantics (both max-merge).

        External LM (reference decode.py:188-190): the host backend scores
        each candidate extension inside the search (exact reference
        semantics, accumulating LM terms at every extension step); the jax
        backend applies the LM as n-best RESCORING of the returned beams —
        total = acoustic + lm_weight * lm.score(tokens), scored once per
        final hypothesis. The backends agree exactly at lm_weight=0
        (tests/test_decode.py); at lm_weight>0 rescoring is an
        approximation whose totals (and possibly rankings) can differ
        from the in-search accumulation."""
        if backend not in ("jax", "host"):
            raise ValueError(f"unknown beam backend {backend!r}; "
                             "use 'jax' or 'host'")
        if backend == "jax":
            from .beam import beams_to_token_lists, ctc_beam_search_jax

            tokens, lengths, scores = ctc_beam_search_jax(
                jnp.asarray(logits), beam_width=beam_width,
                blank_token=self.blank_token,
            )
            token_lists = beams_to_token_lists(np.asarray(tokens), np.asarray(lengths))
            scores = np.asarray(scores)  # one transfer, not one per beam slot
            beam_results = []
            for b, batch_tokens in enumerate(token_lists):
                # Slots the static-width search never filled with a real
                # prefix carry the merged-away NEG_INF sentinel; the host
                # backend (like the reference) returns only real beams.
                results = [
                    DecodingResult(
                        text="",
                        tokens=toks,
                        score=float(scores[b, i]),
                    )
                    for i, toks in enumerate(batch_tokens)
                    if float(scores[b, i]) > -1e29
                ]
                if lm_scorer is not None and lm_weight > 0:
                    # Scorers that distinguish per-extension increments
                    # from whole-sequence scores (e.g. hotwords.
                    # HotwordBooster) expose total_score for exactly this
                    # n-best use; plain LMs score the full sequence.
                    seq_score = getattr(lm_scorer, "total_score", lm_scorer.score)
                    for r in results:
                        r.score += lm_weight * seq_score(r.tokens)
                    results.sort(key=lambda r: r.score, reverse=True)
                if return_all_beams:
                    for r in results:
                        r.text = self._tokens_to_text(r.tokens)
                beam_results.append(results)
        else:
            beam_results = ctc_beam_search(
                logits, beam_width=beam_width, blank_token=self.blank_token,
                lm_scorer=lm_scorer, lm_weight=lm_weight,
            )
            if return_all_beams:
                for batch_results in beam_results:
                    for result in batch_results:
                        result.text = self._tokens_to_text(result.tokens)
        if return_all_beams:
            return beam_results
        return [
            self._tokens_to_text(results[0].tokens) if results else ""
            for results in beam_results
        ]

    def _tokens_to_text(self, tokens: List[int]) -> str:
        chars = [
            self.vocabulary[t] if 0 <= t < self.vocab_size else "<unk>" for t in tokens
        ]
        text = "".join(chars)
        # Subword marker cleanup (reference decode.py:312-315).
        return text.replace("▁", " ").strip()

    def text_to_tokens(self, text: str) -> List[int]:
        tokens = []
        for char in text:
            if char in self.token_to_idx:
                tokens.append(self.token_to_idx[char])
            elif "<unk>" in self.token_to_idx:
                tokens.append(self.token_to_idx["<unk>"])
        return tokens


def create_default_vocabulary(vocab_size: int = 50000) -> List[str]:
    """Default character vocabulary (reference decode.py:330-362)."""
    vocab = ["<blank>", "<unk>", "<pad>", " "]
    vocab.extend(list("abcdefghijklmnopqrstuvwxyz"))
    vocab.extend(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    vocab.extend(list("0123456789"))
    vocab.extend(list(".,!?;:'\"()-"))
    for i in range(len(vocab), vocab_size):
        vocab.append(f"<token_{i}>")
    return vocab
