"""SeraQ: configurable 4-stage recognition model (Trans/Feat/Seq/Pred).

Counterpart of the reference's unused scaffold ``SeraQModel``
(``/root/reference/src/ocrfa/modules/model.py:14-81``): a dataclass config
replaces the ``opt`` namespace + reflection.  Feature extractors and heads
reuse the CRNN building blocks; stages compose functionally.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.crnn import resnet_features, vgg_features
from ocrfa_tpu.models.layers import init_linear, init_lstm, linear
from ocrfa_tpu.ops.lstm import bilstm


@dataclass(frozen=True)
class SeraQConfig:
    feature_extraction: str = "ResNet"   # "VGG" | "ResNet"
    sequence_modeling: str = "BiLSTM"    # "BiLSTM" | "None"
    prediction: str = "CTC"              # CTC only (reference parity)
    transformation: str = "None"         # reference never implements TPS
    input_channel: int = 1
    output_channel: int = 512
    hidden_size: int = 256
    num_class: int = 100

    def validate(self):
        if self.feature_extraction not in ("VGG", "ResNet"):
            raise ValueError("No FeatureExtraction module specified")
        if self.prediction != "CTC":
            raise ValueError("Prediction is neither CTC or Attn")


def seraq_apply(params, x, config: SeraQConfig):
    """(N, H, W, C) crops -> (N, T, num_class) CTC logits."""
    config.validate()
    if config.feature_extraction == "ResNet":
        feats = resnet_features(params["feat"], x)
    else:
        feats = vgg_features(params["feat"], x)
    seq = jnp.mean(feats, axis=1)  # AdaptiveAvgPool over height

    if config.sequence_modeling == "BiLSTM":
        seq = bilstm(seq, params["seq0"])
        seq = bilstm(seq, params["seq1"])
    return linear(seq, params["pred"]["w"], params["pred"]["b"])


def init_seraq(rng, config: SeraQConfig):
    config.validate()
    keys = iter(jax.random.split(rng, 8))
    from ocrfa_tpu.models.crnn import init_crnn_gen1, init_crnn_gen2

    if config.feature_extraction == "ResNet":
        base = init_crnn_gen1(next(keys), config.num_class,
                              config.input_channel, config.output_channel,
                              config.hidden_size)
    else:
        base = init_crnn_gen2(next(keys), config.num_class,
                              config.input_channel, config.output_channel,
                              config.hidden_size)
    params = {"feat": base["feat"]}
    seq_out = config.output_channel
    if config.sequence_modeling == "BiLSTM":
        params["seq0"] = base["seq0"]
        params["seq1"] = base["seq1"]
        seq_out = config.hidden_size
    params["pred"] = init_linear(next(keys), seq_out, config.num_class)
    return params
