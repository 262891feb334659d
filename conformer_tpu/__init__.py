"""conformer_tpu: a TPU-native Conformer ASR framework (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of Alan-404/Conformer
(PyTorch/CUDA) designed for TPU: SPMD over device meshes, static shapes,
MXU-friendly kernels, and XLA-compiled end-to-end pipelines.

Public API shortcuts (heavier subsystems import lazily from their modules):

    from conformer_tpu import Config, load_tokenizer, MelFrontend, Conformer
"""

__version__ = "0.1.0"

from conformer_tpu.config import Config  # noqa: F401


def load_tokenizer(name_or_path: str = "vi", **kwargs):
    from conformer_tpu.text.tokenizer import load_tokenizer as _lt

    return _lt(name_or_path, **kwargs)


def __getattr__(name):
    # Lazy heavyweight exports (avoid importing jax/flax at package import).
    if name == "MelFrontend":
        from conformer_tpu.audio.mel import MelFrontend

        return MelFrontend
    if name == "Conformer":
        from conformer_tpu.models.conformer import Conformer

        return Conformer
    if name == "Transducer":
        from conformer_tpu.models.transducer import Transducer

        return Transducer
    if name == "InferencePipeline":
        from conformer_tpu.decode.pipeline import InferencePipeline

        return InferencePipeline
    if name == "Trainer":
        from conformer_tpu.train.trainer import Trainer

        return Trainer
    if name == "StreamingTranscriber":
        from conformer_tpu.decode.streaming import StreamingTranscriber

        return StreamingTranscriber
    if name == "BeamSearchDecoder":
        from conformer_tpu.decode.beam_search import BeamSearchDecoder

        return BeamSearchDecoder
    raise AttributeError(name)
