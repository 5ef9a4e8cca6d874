"""Speaker diarization: who spoke when, with speaker-attributed ASR.

The reference lists "Speaker Diarization: Integration of speaker
identification output" as a planned extension (reference README.md:483) —
no speaker code exists there. Built here TPU-first:

  - **SpeakerEncoder**: the VELOCITY front-end (TemporalBindingLayer +
    LocalSSMProcessor, the same modules as the ASR encoder) followed by
    masked mean+std statistics pooling and an L2-normalized embedding
    projection. One jitted call embeds a whole batch of analysis windows
    (static shapes, MXU matmuls) — no per-window host loops.
  - **SpeakerTrainer**: additive-margin softmax (AM-softmax) speaker
    classification on the full sharded Trainer runtime (DP mesh,
    accumulation, Orbax checkpoints, metrics). Batches reuse the ASR
    collator contract: the speaker label rides in targets[:, 0]
    (synth.SyntheticSpeakerDataset).
  - **Diarizer**: mel -> energy VAD -> sliding windows over speech ->
    batched on-device embeddings -> agglomerative clustering (host, tiny)
    -> frame-vote segment assembly.
  - **diarization_error_rate**: the standard DER (missed speech + false
    alarm + speaker confusion over total reference speech) with optimal
    speaker mapping and a NIST-style boundary collar.

scripts/diarize.py drives training, file diarization (optionally with
speaker-attributed transcripts via the ASR model), and the synthetic
conversation benchmark (synth.SyntheticConversationDataset).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, compute_mel_spectrogram_np
from .models.ssm import LocalSSMProcessor
from .models.layers import TemporalBindingLayer
from .training import Trainer

#: seconds per mel frame (10 ms hop)
FRAME_S = HOP_LENGTH / SAMPLE_RATE

SPEAKER_OBJECTIVE = "speaker_embedding"


# ----- model ------------------------------------------------------------------


@dataclass
class SpeakerEncoderConfig:
    """Speaker-embedding model configuration.

    The backbone reuses the ASR encoder modules at a smaller scale (the
    embedding task needs voice statistics, not transcription capacity).
    """

    mel_bins: int = 80
    d_model: int = 128
    ssm_layers: int = 4
    ssm_state_dim: int = 32
    ssm_expand_ratio: int = 2
    ssm_kernel_size: int = 4
    dropout: float = 0.1
    embedding_dim: int = 128
    # classification head (training only)
    n_speakers: int = 64
    am_margin: float = 0.2
    am_scale: float = 30.0
    scan_mode: str = "parallel"
    dtype: str = "float32"
    # Trainer-protocol fields (read via getattr by the shared runtime)
    qat: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SpeakerEncoderConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


def scalar_normalize_mel(mel: np.ndarray) -> np.ndarray:
    """Loudness-only normalization for the SPEAKER path: one scalar
    mean/std over all (frame, bin) cells.

    The ASR front-end's per-bin-over-time normalization
    (audio.compute_mel_spectrogram_np) flattens every bin to mean 0 —
    which erases the cross-bin energy profile, i.e. the formant signature
    that identifies a voice. Speaker features keep the spectral shape and
    remove only the recording level. (Measured: per-bin-normalized
    embeddings cluster unseen synthetic voices at ~53% DER; scalar
    normalization on the same encoder/training budget reaches single
    digits — see tests/test_diarize.py.)
    """
    mean = mel.mean()
    std = mel.std() + 1e-5
    return ((mel - mean) / std).astype(np.float32)


def masked_stats_pool(
    feats: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean+std pooling over time: (B, T, D), (B, T) -> (B, 2D).

    fp32 regardless of compute dtype (second moments underflow in bf16).
    """
    feats = feats.astype(jnp.float32)
    m = valid.astype(jnp.float32)[..., None]
    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(feats * m, axis=1) / n
    var = jnp.sum(((feats - mean[:, None, :]) ** 2) * m, axis=1) / n
    std = jnp.sqrt(var + 1e-8)
    return jnp.concatenate([mean, std], axis=-1)


class SpeakerEncoder(nn.Module):
    """Mel -> L2-normalized speaker embedding."""

    config: SpeakerEncoderConfig

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.compute_dtype
        x = TemporalBindingLayer(
            mel_bins=cfg.mel_bins, d_model=cfg.d_model, dtype=dtype,
            name="temporal_binding",
        )(mel, train)
        feats = LocalSSMProcessor(
            d_model=cfg.d_model,
            num_layers=cfg.ssm_layers,
            state_dim=cfg.ssm_state_dim,
            expand_ratio=cfg.ssm_expand_ratio,
            kernel_size=cfg.ssm_kernel_size,
            dropout=cfg.dropout,
            scan_mode=cfg.scan_mode,
            dtype=dtype,
            name="local_ssm",
        )(x, train)
        t2 = feats.shape[1]
        if input_lengths is None:
            valid = jnp.ones((feats.shape[0], t2), bool)
        else:
            out_len = (input_lengths + 1) // 2  # stride-2 front-end
            valid = jnp.arange(t2)[None, :] < out_len[:, None]
        stats = masked_stats_pool(feats, valid)
        emb = nn.Dense(cfg.embedding_dim, dtype=jnp.float32, name="emb_proj")(
            stats
        )
        return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)


class SpeakerClassifier(nn.Module):
    """SpeakerEncoder + cosine classifier head (training graph).

    Returns (embeddings, cosine logits); the AM-softmax margin/scale are
    applied in the loss, so the same forward serves train and eval.
    """

    config: SpeakerEncoderConfig

    @nn.compact
    def __call__(
        self,
        mel: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        emb = SpeakerEncoder(config=cfg, name="encoder")(
            mel, input_lengths, train
        )
        w = self.param(
            "class_weights",
            nn.initializers.normal(stddev=0.05),
            (cfg.n_speakers, cfg.embedding_dim),
            jnp.float32,
        )
        wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-8)
        return emb, emb @ wn.T


def am_softmax_loss(
    cos: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float,
    scale: float,
    n_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Additive-margin softmax over cosine logits (B, C)."""
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=jnp.float32)
    logits = scale * (cos - margin * onehot)
    per = -jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    if n_valid is None:
        return jnp.mean(per)
    w = (jnp.arange(per.shape[0]) < n_valid).astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


class SpeakerTrainer(Trainer):
    """Trainer whose objective is AM-softmax speaker classification.

    Reuses the full Trainer runtime; batches follow the ASR contract with
    the speaker id in targets[:, 0] (synth.SyntheticSpeakerDataset).
    """

    def __init__(self, model: SpeakerClassifier, config, train_iter,
                 eval_batches=None, **kwargs):
        if config.streaming_chunks:
            raise ValueError(
                "the streaming-aware objective is an ASR feature; speaker "
                "training does not support training.streaming_chunks"
            )
        super().__init__(model, config, train_iter, eval_batches, **kwargs)

    def _loss_fn(self, params, quant_stats, batch, dropout_rng, train, n_valid):
        mel, _, input_lengths, dropout_rng = self._batch_mel(
            batch, dropout_rng, train
        )
        if train and self.config.augment is not None and self.config.augment.enabled:
            from .training import spec_augment

            aug_rng, dropout_rng = jax.random.split(dropout_rng)
            mel = spec_augment(
                mel, aug_rng, self.config.augment, input_lengths
            )
        rngs = (
            {"dropout": dropout_rng}
            if train and dropout_rng is not None else {}
        )
        _, cos = self.model.apply(
            {"params": params}, mel, input_lengths=input_lengths,
            train=train, rngs=rngs,
        )
        cfg = self.model.config
        loss = am_softmax_loss(
            cos, batch["targets"][:, 0], cfg.am_margin, cfg.am_scale, n_valid
        )
        return loss, quant_stats


# ----- artifacts --------------------------------------------------------------


def save_speaker_artifact(
    save_path: str, config: SpeakerEncoderConfig, params: Dict[str, Any]
) -> None:
    """Persist the trained classifier (encoder subtree + class weights) in
    the save_pretrained layout, tagged objective=speaker_embedding."""
    from .models.model import save_pretrained

    save_pretrained(
        save_path, config, params, extra={"objective": SPEAKER_OBJECTIVE}
    )


def is_speaker_artifact(path: str) -> bool:
    config_file = os.path.join(path, "config.json")
    if not os.path.exists(config_file):
        return False
    with open(config_file) as f:
        return json.load(f).get("objective") == SPEAKER_OBJECTIVE


def load_speaker_artifact(
    path: str,
) -> Tuple[SpeakerEncoderConfig, Dict[str, Any]]:
    """Load (config, classifier params). The encoder subtree for inference
    is params["encoder"]."""
    from .models.model import CONFIG_FILE, PARAMS_FILE

    with open(os.path.join(path, CONFIG_FILE)) as f:
        payload = json.load(f)
    if payload.get("objective") != SPEAKER_OBJECTIVE:
        raise ValueError(f"{path} is not a speaker-embedding artifact")
    config = SpeakerEncoderConfig.from_dict(payload.get("config", {}))
    model = SpeakerClassifier(config=config)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, config.mel_bins), jnp.float32),
        train=False,
    )["params"]
    with open(os.path.join(path, PARAMS_FILE), "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())
    return config, params


# ----- VAD + windowing (host-side, cheap) --------------------------------------


def energy_vad(
    mel_raw: np.ndarray,
    threshold: float = 0.35,
    min_speech_s: float = 0.25,
    min_gap_s: float = 0.35,
) -> np.ndarray:
    """Frame-level speech mask from UN-normalized log-mel.

    The threshold is relative: floor + threshold * (ceiling - floor) on the
    per-frame mean log-mel energy, with floor/ceiling at the 10th/95th
    percentiles — robust to the recording's absolute level. Gaps shorter
    than min_gap_s are closed, then speech islands shorter than
    min_speech_s are dropped.
    """
    e = mel_raw.mean(axis=-1)
    floor = np.percentile(e, 10)
    ceil = np.percentile(e, 95)
    if ceil - floor < 1e-3:
        return np.zeros(len(e), bool)  # silence or constant signal
    speech = e > floor + threshold * (ceil - floor)

    def _runs(mask: np.ndarray, value: bool):
        idx = np.flatnonzero(
            np.diff(np.r_[False, mask == value, False].astype(np.int8))
        )
        return list(zip(idx[::2], idx[1::2]))

    min_gap = int(round(min_gap_s / FRAME_S))
    for s, t in _runs(speech, False):
        if 0 < s and t < len(speech) and t - s < min_gap:
            speech[s:t] = True
    min_speech = int(round(min_speech_s / FRAME_S))
    for s, t in _runs(speech, True):
        if t - s < min_speech:
            speech[s:t] = False
    return speech


def speech_regions(speech: np.ndarray) -> List[Tuple[int, int]]:
    """[(start_frame, end_frame)) runs of True."""
    idx = np.flatnonzero(
        np.diff(np.r_[False, speech.astype(bool), False].astype(np.int8))
    )
    return list(zip(idx[::2], idx[1::2]))


def window_plan(
    regions: Sequence[Tuple[int, int]], window: int, hop: int
) -> List[Tuple[int, int]]:
    """Sliding-window placement over speech regions.

    Returns [(start_frame, valid_frames)] with valid_frames <= window.
    Regions shorter than the window yield one partial window (the encoder
    masks invalid frames); longer regions get hop-strided windows plus a
    final window flushed to the region end so the tail is always covered.
    """
    plan: List[Tuple[int, int]] = []
    for s, t in regions:
        n = t - s
        if n <= 0:
            continue
        if n <= window:
            plan.append((s, n))
            continue
        starts = list(range(s, t - window + 1, hop))
        if starts[-1] + window < t:
            starts.append(t - window)
        plan.extend((st, window) for st in starts)
    return plan


# ----- DER ---------------------------------------------------------------------


def _as_tuples(segs) -> List[Tuple[float, float, Any]]:
    out = []
    for s in segs:
        if isinstance(s, dict):
            out.append((float(s["start"]), float(s["end"]), s["speaker"]))
        else:
            out.append((float(s[0]), float(s[1]), s[2]))
    return [(a, b, spk) for a, b, spk in out if b > a]


def diarization_error_rate(
    reference, hypothesis, collar: float = 0.25
) -> Dict[str, float]:
    """Standard DER with optimal speaker mapping and a boundary collar.

    reference/hypothesis: sequences of {"start","end","speaker"} dicts or
    (start, end, speaker) tuples; overlapping speech is handled with the
    usual set-cardinality accounting. The collar excludes +-collar seconds
    around every REFERENCE segment boundary from scoring (NIST md-eval
    convention). Returns {"der","miss","false_alarm","confusion","total"}
    (times in seconds; der = (miss+fa+conf)/total).
    """
    from scipy.optimize import linear_sum_assignment

    ref = _as_tuples(reference)
    hyp = _as_tuples(hypothesis)

    excl: List[Tuple[float, float]] = []
    if collar > 0:
        for a, b, _ in ref:
            excl.append((a - collar, a + collar))
            excl.append((b - collar, b + collar))

    bounds = sorted(
        {x for a, b, _ in ref + hyp for x in (a, b)}
        | {x for e in excl for x in e}
    )
    ref_spk = sorted({s for _, _, s in ref}, key=str)
    hyp_spk = sorted({s for _, _, s in hyp}, key=str)
    r_ix = {s: i for i, s in enumerate(ref_spk)}
    h_ix = {s: i for i, s in enumerate(hyp_spk)}

    def _atoms():
        for t0, t1 in zip(bounds, bounds[1:]):
            if t1 - t0 <= 1e-9:
                continue
            mid = 0.5 * (t0 + t1)
            if any(a < mid < b for a, b in excl):
                continue
            r = {s for a, b, s in ref if a <= mid < b}
            h = {s for a, b, s in hyp if a <= mid < b}
            yield t1 - t0, r, h

    # pass 1: overlap matrix -> optimal mapping (maximize co-active time)
    overlap = np.zeros((max(len(ref_spk), 1), max(len(hyp_spk), 1)))
    for dur, r, h in _atoms():
        for s in r:
            for q in h:
                overlap[r_ix[s], h_ix[q]] += dur
    rows, cols = linear_sum_assignment(-overlap)
    mapping = {
        hyp_spk[c]: ref_spk[r]
        for r, c in zip(rows, cols)
        if r < len(ref_spk) and c < len(hyp_spk) and overlap[r, c] > 0
    }

    # pass 2: error accounting
    miss = fa = conf = total = 0.0
    for dur, r, h in _atoms():
        total += dur * len(r)
        n_r, n_h = len(r), len(h)
        matched = sum(1 for q in h if mapping.get(q) in r)
        miss += dur * max(0, n_r - n_h)
        fa += dur * max(0, n_h - n_r)
        conf += dur * (min(n_r, n_h) - matched)
    der = (miss + fa + conf) / total if total > 0 else 0.0
    return {
        "der": der, "miss": miss, "false_alarm": fa,
        "confusion": conf, "total": total,
    }


# ----- the diarization pipeline -------------------------------------------------


@dataclass
class DiarizeConfig:
    """Runtime knobs for the diarization pipeline."""

    window_s: float = 1.5
    hop_s: float = 0.4
    # energy-VAD relative threshold. Tuned on the dev conversation split
    # (tools/tune_clustering.py --vad-threshold sweep): 0.35 missed 8% of
    # speech (soft turn onsets under the noise bed) with 0 false alarm;
    # 0.15 is the knee — 0.09% miss, still 0 FA; 0.10 starts admitting
    # noise (FA + cluster pollution). Raise it for noisier recordings.
    vad_threshold: float = 0.15
    min_speech_s: float = 0.25
    min_gap_s: float = 0.35
    # agglomerative clustering: cosine-distance cut when the speaker count
    # is unknown (fcluster criterion="distance")
    cluster_threshold: float = 0.45
    # post-clustering refinement: iterations of nearest-centroid
    # reassignment (0 disables). Windows that straddle a speaker turn often
    # land in the wrong spectral cluster; the centroid pass corrects them
    # (dev DER known 7.28% -> 6.48%, unknown 7.57% -> 7.20%,
    # tools/tune_clustering.py reassign variants).
    refine_iters: int = 2
    # "spectral" (kNN-graph spectral clustering, silhouette-selected count
    # — the default; measured better DER and count accuracy on both known
    # and unknown counts, BENCH_DETAILS_r03.md) or "ahc"
    cluster_method: str = "spectral"
    # spectral count-search ceiling
    max_speakers: int = 8
    # windows per jit call are padded up to a multiple of this
    batch_bucket: int = 64


@dataclass
class Segment:
    start: float
    end: float
    speaker: int
    text: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        d = {"start": self.start, "end": self.end, "speaker": self.speaker}
        if self.text is not None:
            d["text"] = self.text
        return d


def cluster_embeddings(
    emb: np.ndarray,
    n_speakers: Optional[int] = None,
    threshold: float = 0.45,
) -> np.ndarray:
    """Average-linkage agglomerative clustering on cosine distance.

    n_speakers pins the cluster count (conference-call case: known
    participants); otherwise the tree is cut at `threshold`.
    Returns 0-based labels (N,).
    """
    from scipy.cluster.hierarchy import fcluster, linkage
    from scipy.spatial.distance import pdist

    n = emb.shape[0]
    if n == 0:
        return np.zeros(0, np.int32)
    if n == 1:
        return np.zeros(1, np.int32)
    d = pdist(emb.astype(np.float64), metric="cosine")
    z = linkage(d, method="average")
    if n_speakers is not None:
        labels = fcluster(z, min(n_speakers, n), criterion="maxclust")
    else:
        labels = fcluster(z, threshold, criterion="distance")
    # relabel to 0..K-1 in order of first appearance (deterministic)
    remap: Dict[int, int] = {}
    out = np.empty(n, np.int32)
    for i, lab in enumerate(labels):
        if lab not in remap:
            remap[lab] = len(remap)
        out[i] = remap[lab]
    return out


def reassign_to_centroids(
    emb: np.ndarray, labels: np.ndarray, iters: int = 2
) -> np.ndarray:
    """Refine cluster labels: reassign each window to the nearest cluster
    centroid under cosine similarity, recomputing centroids each pass.

    The spectral/AHC partition optimizes a graph objective in which
    boundary windows (analysis windows straddling a speaker turn) can end
    up on the wrong side; one or two nearest-centroid passes correct them.
    May empty a cluster (the count can only shrink). Labels are returned
    relabeled 0..K-1 in order of first appearance, like the clusterers.
    """
    lab = labels.astype(np.int32, copy=True)
    if lab.size <= 1 or iters <= 0:
        return lab
    x = emb.astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    for _ in range(iters):
        ks = sorted(set(lab.tolist()))
        if len(ks) < 2:
            break
        cents = np.stack([x[lab == kk].mean(axis=0) for kk in ks])
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12
        new = np.asarray(ks, np.int32)[np.argmax(x @ cents.T, axis=1)]
        if (new == lab).all():
            break
        lab = new
    remap: Dict[int, int] = {}
    out = np.empty(lab.size, np.int32)
    for i, v in enumerate(lab):
        if int(v) not in remap:
            remap[int(v)] = len(remap)
        out[i] = remap[int(v)]
    return out


def _kmeans(x: np.ndarray, k: int, restarts: int = 10, iters: int = 50,
            seed: int = 0) -> np.ndarray:
    """Deterministic k-means (best of `restarts` k-means++ inits).

    Tiny host-side problem (N windows × k eigenvectors); scipy's kmeans2
    warns on empty clusters and is not seedable per-restart, so this is
    self-contained.
    """
    n = x.shape[0]
    k = min(k, n)
    best_labels, best_inertia = None, np.inf
    for r in range(restarts):
        rng = np.random.default_rng(seed + r)
        # k-means++ seeding
        centers = [x[rng.integers(n)]]
        for _ in range(1, k):
            d2 = np.min(
                ((x[:, None, :] - np.asarray(centers)[None]) ** 2).sum(-1),
                axis=1,
            )
            tot = d2.sum()
            if tot <= 1e-12:
                centers.append(x[rng.integers(n)])
                continue
            centers.append(x[rng.choice(n, p=d2 / tot)])
        c = np.asarray(centers)
        labels = np.zeros(n, np.int32)
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None]) ** 2).sum(-1)
            new_labels = d2.argmin(axis=1).astype(np.int32)
            if (new_labels == labels).all() and _ > 0:
                break
            labels = new_labels
            for j in range(k):
                sel = labels == j
                if sel.any():
                    c[j] = x[sel].mean(axis=0)
        inertia = float(((x - c[labels]) ** 2).sum())
        if inertia < best_inertia:
            best_inertia, best_labels = inertia, labels
    return best_labels


def _mean_silhouette(emb: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette coefficient on cosine distance (count-selection
    criterion). -1 when fewer than two clusters."""
    x = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
    d = 1.0 - x @ x.T
    ks = sorted(set(labels.tolist()))
    if len(ks) < 2:
        return -1.0
    n = len(labels)
    s = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        same[i] = False
        a = d[i][same].mean() if same.any() else 0.0
        b = min(d[i][labels == kk].mean() for kk in ks if kk != labels[i])
        s[i] = (b - a) / max(a, b, 1e-12)
    return float(s.mean())


def spectral_cluster_embeddings(
    emb: np.ndarray,
    n_speakers: Optional[int] = None,
    max_speakers: int = 8,
    graph_density: float = 0.2,
    min_silhouette: float = 0.15,
) -> np.ndarray:
    """Spectral clustering with silhouette-selected speaker count.

    The AHC threshold cut (cluster_embeddings) needs a corpus-tuned
    distance threshold and over-merges similar voices. This clusterer:

      1. builds a binarized kNN affinity graph — each window keeps edges
         to its top ``graph_density * n`` cosine neighbors, symmetrized
         (binarization makes the block structure crisp where raw cosine
         values are uniformly high across a conversation);
      2. takes the eigenvectors of the graph Laplacian L = D - A;
      3. for each candidate k, k-means the rows of the first k
         eigenvectors, and — when the count is unknown — picks the k
         whose partition maximizes the mean silhouette of the ORIGINAL
         embeddings under cosine distance. A best silhouette below
         ``min_silhouette`` means no credible multi-speaker structure
         (measured at the encoder's 128-dim operating point: single-voice
         recordings score ~0.03, real 2-4-speaker conversations >= 0.45;
         silhouette is scale-invariant, so re-calibrate the floor for a
         much lower-dimensional embedding) -> one speaker.

    Selection method and defaults were tuned on the dev conversation
    split only (tools/tune_clustering.py; dev DER 14.7% / count accuracy
    0.80 vs 23.3% / 0.30 for the best AHC threshold) — test-split numbers
    in BENCH_DETAILS_r03.md. NME eigengap estimation (Park et al., IEEE
    SPL 2019) was evaluated and rejected: it overestimates the count on
    these embeddings (dev count accuracy 0.35).

    `n_speakers` pins k. Returns 0-based labels relabeled in order of
    first appearance, like cluster_embeddings.
    """
    n = emb.shape[0]
    if n == 0:
        return np.zeros(0, np.int32)
    if n == 1:
        return np.zeros(1, np.int32)

    x = emb.astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    aff = x @ x.T
    np.fill_diagonal(aff, 0.0)

    # binarized top-p neighbor graph (positions n-p.. after a partition at
    # kth = n-p are the row's p largest affinities)
    p = int(min(max(2, round(graph_density * n)), n - 1))
    a_p = np.zeros_like(aff)
    idx = np.argpartition(aff, n - p, axis=1)[:, n - p:]
    rows = np.repeat(np.arange(n), p)
    a_p[rows, idx.ravel()] = 1.0
    a_p = 0.5 * (a_p + a_p.T)

    lap = np.diag(a_p.sum(axis=1)) - a_p
    _, vecs = np.linalg.eigh(lap)

    def cluster_at(k: int) -> np.ndarray:
        feats = vecs[:, :k]
        feats = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
        return _kmeans(feats, k)

    if n_speakers is not None:
        k = min(n_speakers, n)
        labels = cluster_at(k) if k > 1 else np.zeros(n, np.int32)
    else:
        best_labels, best_s = None, -1.0
        for k in range(2, int(min(max_speakers, n - 1)) + 1):
            cand = cluster_at(k)
            s = _mean_silhouette(emb, cand)
            if s > best_s:
                best_labels, best_s = cand, s
        if best_labels is None or best_s < min_silhouette:
            return np.zeros(n, np.int32)
        labels = best_labels

    remap: Dict[int, int] = {}
    out = np.empty(n, np.int32)
    for i, lab in enumerate(labels):
        if lab not in remap:
            remap[lab] = len(remap)
        out[i] = remap[lab]
    return out


class Diarizer:
    """End-to-end diarization with a trained speaker encoder.

    All mel windows of an audio file are embedded in a handful of jitted
    batched calls (static (bucket, window, mel_bins) shapes); VAD,
    clustering, and segment assembly are microseconds of host numpy.
    """

    def __init__(
        self,
        model_dir: Optional[str] = None,
        *,
        encoder_config: Optional[SpeakerEncoderConfig] = None,
        encoder_params: Optional[Dict[str, Any]] = None,
        config: Optional[DiarizeConfig] = None,
    ):
        if model_dir is not None:
            enc_cfg, params = load_speaker_artifact(model_dir)
            encoder_config, encoder_params = enc_cfg, params["encoder"]
        if encoder_config is None or encoder_params is None:
            raise ValueError(
                "Diarizer needs model_dir or (encoder_config, encoder_params)"
            )
        self.encoder_config = encoder_config
        self.encoder_params = encoder_params
        self.config = config or DiarizeConfig()
        self._encoder = SpeakerEncoder(config=encoder_config)

        def _embed(params, windows, lengths):
            # per-window masked SCALAR normalization over valid cells — the
            # same statistics scalar_normalize_mel gives the encoder in
            # training (loudness removed, spectral shape kept; see its
            # docstring for why per-bin normalization is wrong here)
            t = windows.shape[1]
            nb = windows.shape[2]
            m = (jnp.arange(t)[None, :] < lengths[:, None]).astype(
                jnp.float32
            )[..., None]
            n = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * nb, 1.0)
            mean = jnp.sum(windows * m, axis=(1, 2), keepdims=True) / n
            var = jnp.sum(((windows - mean) ** 2) * m, axis=(1, 2),
                          keepdims=True) / n
            normed = (windows - mean) / (jnp.sqrt(var) + 1e-5) * m
            return self._encoder.apply(
                {"params": params}, normed, input_lengths=lengths, train=False
            )

        self._embed = jax.jit(_embed)

    @property
    def window_frames(self) -> int:
        return int(round(self.config.window_s / FRAME_S))

    @property
    def hop_frames(self) -> int:
        return max(int(round(self.config.hop_s / FRAME_S)), 1)

    def embed_windows(
        self, mel_raw: np.ndarray, plan: Sequence[Tuple[int, int]]
    ) -> np.ndarray:
        """Embed analysis windows of an UN-normalized mel (T, mel_bins)."""
        if not plan:
            return np.zeros((0, self.encoder_config.embedding_dim), np.float32)
        w = self.window_frames
        t_total = mel_raw.shape[0]
        n = len(plan)
        windows = np.zeros((n, w, mel_raw.shape[1]), np.float32)
        lengths = np.zeros((n,), np.int32)
        for i, (start, valid) in enumerate(plan):
            stop = min(start + min(valid, w), t_total)
            seg = mel_raw[start:stop]
            windows[i, : seg.shape[0]] = seg
            lengths[i] = seg.shape[0]
        bucket = self.config.batch_bucket
        out = np.zeros((n, self.encoder_config.embedding_dim), np.float32)
        for ofs in range(0, n, bucket):
            chunk = windows[ofs : ofs + bucket]
            lens = lengths[ofs : ofs + bucket]
            pad = bucket - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, w, mel_raw.shape[1]), np.float32)]
                )
                lens = np.concatenate([lens, np.ones((pad,), np.int32)])
            emb = np.asarray(self._embed(self.encoder_params, chunk, lens))
            out[ofs : ofs + bucket] = emb[: bucket - pad if pad else bucket]
        return out

    def diarize(
        self,
        audio: np.ndarray,
        n_speakers: Optional[int] = None,
    ) -> List[Segment]:
        """Audio (16 kHz mono float) -> speaker-labeled segments."""
        cfg = self.config
        mel_raw = compute_mel_spectrogram_np(audio, normalize=False)
        speech = energy_vad(
            mel_raw, cfg.vad_threshold, cfg.min_speech_s, cfg.min_gap_s
        )
        regions = speech_regions(speech)
        plan = window_plan(regions, self.window_frames, self.hop_frames)
        emb = self.embed_windows(mel_raw, plan)
        if cfg.cluster_method == "spectral":
            labels = spectral_cluster_embeddings(
                emb, n_speakers=n_speakers, max_speakers=cfg.max_speakers
            )
        elif cfg.cluster_method == "ahc":
            labels = cluster_embeddings(
                emb, n_speakers=n_speakers, threshold=cfg.cluster_threshold
            )
        else:
            raise ValueError(
                f"unknown cluster_method {cfg.cluster_method!r} "
                "(expected 'spectral' or 'ahc')"
            )
        if labels.size and labels.max() > 0:
            refined = reassign_to_centroids(emb, labels, cfg.refine_iters)
            # a pinned speaker count is a contract: if the centroid pass
            # emptied a cluster (it can only shrink the count), keep the
            # unrefined partition rather than under-deliver
            if n_speakers is None or len(set(refined.tolist())) == len(
                set(labels.tolist())
            ):
                labels = refined

        # frame-level majority vote over covering windows, then runs ->
        # segments (only frames the VAD marked as speech)
        n_clusters = int(labels.max()) + 1 if labels.size else 0
        votes = np.zeros((mel_raw.shape[0], max(n_clusters, 1)), np.int32)
        for (start, valid), lab in zip(plan, labels):
            votes[start : start + valid, lab] += 1
        segs: List[Segment] = []
        covered = votes.sum(axis=1) > 0
        frame_lab = votes.argmax(axis=1)
        active = speech & covered
        prev = None
        seg_start = 0
        for t in range(len(active) + 1):
            cur = int(frame_lab[t]) if t < len(active) and active[t] else None
            if cur != prev:
                if prev is not None:
                    segs.append(
                        Segment(seg_start * FRAME_S, t * FRAME_S, prev)
                    )
                seg_start = t
                prev = cur
        return segs
