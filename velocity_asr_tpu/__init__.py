"""VELOCITY-ASR TPU — a TPU-native JAX/Pallas speech-recognition framework.

Ground-up rebuild of the capabilities of the reference VELOCITY-ASR v2
(PyTorch, single-GPU) as an idiomatic JAX/XLA/Pallas/pjit framework:
  - on-device log-mel front-end (audio)
  - selective-SSM encoder with lax.scan / lax.associative_scan / Pallas
    selective-scan kernels (ops, models)
  - hierarchical global context with static-shape adaptive pooling
  - vectorized CTC decoding (decode)
  - CTC training with data-parallel pjit, bf16, Orbax checkpoints (training)
  - quantization-aware training + INT8 inference (quantize)

The public API mirrors the reference package __init__
(/root/reference/velocity_asr/__init__.py:27-145).
"""

__version__ = "2.0.0"

from .audio import (
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    SAMPLE_RATE,
    MelSpectrogramTransform,
    audio_to_frames,
    compute_mel_spectrogram,
    frames_to_audio,
    load_audio,
    mel_filterbank,
    pad_or_trim,
)
from .models import (
    AdaptivePool,
    CTCOutputHead,
    GatedFusion,
    GlobalSSM,
    HierarchicalGlobalContext,
    LocalSSMProcessor,
    MultiHeadAttention,
    PositionalEncoding2D,
    SelectiveSSM,
    SSMBlock,
    TemporalBindingLayer,
    VelocityASR,
    VelocityASRConfig,
    count_parameters,
    create_model,
    forward,
    from_pretrained,
    get_output_length,
    init_params,
    save_pretrained,
)
from .ops import (
    ScanMode,
    selective_scan,
    selective_scan_parallel,
    selective_scan_sequential,
)
from .decode import (
    BLANK_TOKEN,
    CTCDecoder,
    DecodingResult,
    create_default_vocabulary,
    ctc_beam_search,
    ctc_greedy_decode,
    ctc_greedy_decode_with_timestamps,
)
from .quantize import (
    FakeQuantize,
    QuantConv1d,
    QuantDense,
    QuantizationConfig,
    calibrate_model,
    get_model_size_mb,
    init_quant_stats,
    mark_calibrated,
    prepare_model_for_qat,
)

__all__ = [
    "__version__",
    # audio
    "SAMPLE_RATE", "N_FFT", "HOP_LENGTH", "N_MELS",
    "MelSpectrogramTransform", "audio_to_frames", "compute_mel_spectrogram",
    "frames_to_audio", "load_audio", "mel_filterbank", "pad_or_trim",
    # models
    "AdaptivePool", "CTCOutputHead", "GatedFusion", "GlobalSSM",
    "HierarchicalGlobalContext", "LocalSSMProcessor", "MultiHeadAttention",
    "PositionalEncoding2D", "SelectiveSSM", "SSMBlock", "TemporalBindingLayer",
    "VelocityASR", "VelocityASRConfig", "count_parameters", "create_model",
    "forward", "from_pretrained", "get_output_length", "init_params",
    "save_pretrained",
    # ops
    "ScanMode", "selective_scan", "selective_scan_parallel",
    "selective_scan_sequential",
    # decode
    "BLANK_TOKEN", "CTCDecoder", "DecodingResult", "create_default_vocabulary",
    "ctc_beam_search", "ctc_greedy_decode", "ctc_greedy_decode_with_timestamps",
    # quantize
    "FakeQuantize", "QuantConv1d", "QuantDense", "QuantizationConfig",
    "calibrate_model", "get_model_size_mb", "init_quant_stats",
    "mark_calibrated", "prepare_model_for_qat",
]


def __getattr__(name):
    # Lazy imports for heavier submodules (training pulls in optax/orbax).
    if name in (
        "Trainer", "TrainingConfig", "CTCLoss", "WarmupCosineScheduler",
        "compute_wer", "compute_cer",
    ):
        from . import training

        return getattr(training, name)
    if name in (
        "ASRDataset", "ASRCollator", "LibriSpeechDataset", "create_dataloader",
        "create_librispeech_dataloaders",
    ):
        from . import data

        return getattr(data, name)
    if name in ("ctc_beam_search_jax", "beams_to_token_lists",
                "StreamingBeam", "ctc_beam_resume", "beam_state_init",
                "beam_commit", "beam_finalize"):
        from . import beam

        return getattr(beam, name)
    if name in ("StreamingTranscriber", "StreamingMel",
                "BatchedStreamingTranscriber", "StreamSessionBatcher"):
        from . import streaming

        return getattr(streaming, name)
    if name in (
        "MaskedPredictor", "MaskedPredictionConfig", "PretrainTrainer",
        "init_asr_from_backbone",
    ):
        from . import pretrain

        return getattr(pretrain, name)
    if name == "HotwordBooster":
        from .hotwords import HotwordBooster

        return HotwordBooster
    if name in (
        "Diarizer", "DiarizeConfig", "SpeakerEncoder", "SpeakerEncoderConfig",
        "SpeakerTrainer", "diarization_error_rate",
    ):
        from . import diarize

        return getattr(diarize, name)
    if name in ("CharNGramLM", "CombinedScorer"):
        from . import lm

        return getattr(lm, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
