"""Checkpoint conversion and persistence.

Converts reference torch ``.pth``/``.pt`` state dicts (downloaded from the
reference model zoo, registry.py) into this framework's parameter pytrees,
and persists native checkpoints via Orbax.

Key-name contracts come from the reference module trees:
* CRNN gen1/gen2: ``FeatureExtraction.ConvNet.*``, ``SequenceModeling.{0,1}``,
  ``Prediction`` (``modules/blocks.py:394-447``).
* CRAFT: ``basenet.slice*``, ``upconv*``, ``conv_cls`` (``utils.py:48-98``).

Weight layout transforms: torch conv ``(O, I, kh, kw)`` -> HWIO; linear and
LSTM weights keep torch layout (see :mod:`ocrfa_tpu.ops.lstm`).
"""

from __future__ import annotations

import os

import numpy as np


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint to numpy, stripping any ``module.`` prefix."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for key, value in state.items():
        if key.startswith("module."):
            key = key[len("module."):]
        out[key] = _to_numpy(value)
    return out


def _conv(sd, prefix, bias=False):
    p = {"w": np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0))}
    if bias:
        p["b"] = sd[prefix + ".bias"]
    return p


def _bn(sd, prefix):
    return {
        "scale": sd[prefix + ".weight"],
        "bias": sd[prefix + ".bias"],
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }


def _linear(sd, prefix):
    return {"w": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}


def _bilstm(sd, prefix):
    return {
        "w_ih": sd[f"{prefix}.rnn.weight_ih_l0"],
        "w_hh": sd[f"{prefix}.rnn.weight_hh_l0"],
        "b_ih": sd[f"{prefix}.rnn.bias_ih_l0"],
        "b_hh": sd[f"{prefix}.rnn.bias_hh_l0"],
        "w_ih_rev": sd[f"{prefix}.rnn.weight_ih_l0_reverse"],
        "w_hh_rev": sd[f"{prefix}.rnn.weight_hh_l0_reverse"],
        "b_ih_rev": sd[f"{prefix}.rnn.bias_ih_l0_reverse"],
        "b_hh_rev": sd[f"{prefix}.rnn.bias_hh_l0_reverse"],
        "linear_w": sd[f"{prefix}.linear.weight"],
        "linear_b": sd[f"{prefix}.linear.bias"],
    }


def _res_block(sd, prefix):
    p = {
        "conv1": _conv(sd, prefix + ".conv1"),
        "bn1": _bn(sd, prefix + ".bn1"),
        "conv2": _conv(sd, prefix + ".conv2"),
        "bn2": _bn(sd, prefix + ".bn2"),
    }
    if prefix + ".downsample.0.weight" in sd:
        p["downsample"] = {
            "conv": _conv(sd, prefix + ".downsample.0"),
            "bn": _bn(sd, prefix + ".downsample.1"),
        }
    return p


def convert_crnn_gen1(sd: dict) -> dict:
    """Reference gen1 ``Model`` state dict -> crnn params pytree."""
    f = "FeatureExtraction.ConvNet"
    layers = {"layer1": 1, "layer2": 2, "layer3": 5, "layer4": 3}
    feat = {
        "conv0_1": _conv(sd, f + ".conv0_1"),
        "bn0_1": _bn(sd, f + ".bn0_1"),
        "conv0_2": _conv(sd, f + ".conv0_2"),
        "bn0_2": _bn(sd, f + ".bn0_2"),
        "conv1": _conv(sd, f + ".conv1"),
        "bn1": _bn(sd, f + ".bn1"),
        "conv2": _conv(sd, f + ".conv2"),
        "bn2": _bn(sd, f + ".bn2"),
        "conv3": _conv(sd, f + ".conv3"),
        "bn3": _bn(sd, f + ".bn3"),
        "conv4_1": _conv(sd, f + ".conv4_1"),
        "bn4_1": _bn(sd, f + ".bn4_1"),
        "conv4_2": _conv(sd, f + ".conv4_2"),
        "bn4_2": _bn(sd, f + ".bn4_2"),
    }
    for name, n in layers.items():
        feat[name] = [_res_block(sd, f"{f}.{name}.{i}") for i in range(n)]
    return {
        "feat": feat,
        "seq0": _bilstm(sd, "SequenceModeling.0"),
        "seq1": _bilstm(sd, "SequenceModeling.1"),
        "pred": _linear(sd, "Prediction"),
    }


def export_crnn_gen1(params) -> dict:
    """crnn gen1 params pytree -> reference-keyed torch-layout state dict.

    Exact inverse of :func:`convert_crnn_gen1` (conv HWIO -> OIHW; linear
    and LSTM tensors already share torch layout).  Lets models trained in
    this framework run inside the reference torch pipeline — used by the
    cross-framework eval harness (``scripts/eval_farsi.py``).
    """
    sd = {}

    def put_conv(prefix, p):
        _put_conv(sd, prefix, p)

    def put_bn(prefix, p):
        _put_bn(sd, prefix, p)

    def put_bilstm(prefix, p):
        for ours, theirs in (
            ("w_ih", "rnn.weight_ih_l0"), ("w_hh", "rnn.weight_hh_l0"),
            ("b_ih", "rnn.bias_ih_l0"), ("b_hh", "rnn.bias_hh_l0"),
            ("w_ih_rev", "rnn.weight_ih_l0_reverse"),
            ("w_hh_rev", "rnn.weight_hh_l0_reverse"),
            ("b_ih_rev", "rnn.bias_ih_l0_reverse"),
            ("b_hh_rev", "rnn.bias_hh_l0_reverse"),
            ("linear_w", "linear.weight"), ("linear_b", "linear.bias"),
        ):
            sd[f"{prefix}.{theirs}"] = _to_numpy(p[ours])

    f = "FeatureExtraction.ConvNet"
    feat = params["feat"]
    for name in ("conv0_1", "conv0_2", "conv1", "conv2", "conv3",
                 "conv4_1", "conv4_2"):
        put_conv(f"{f}.{name}", feat[name])
        put_bn(f"{f}.bn{name[4:]}", feat["bn" + name[4:]])
    for lname in ("layer1", "layer2", "layer3", "layer4"):
        for i, bp in enumerate(feat[lname]):
            put_conv(f"{f}.{lname}.{i}.conv1", bp["conv1"])
            put_bn(f"{f}.{lname}.{i}.bn1", bp["bn1"])
            put_conv(f"{f}.{lname}.{i}.conv2", bp["conv2"])
            put_bn(f"{f}.{lname}.{i}.bn2", bp["bn2"])
            if "downsample" in bp:
                put_conv(f"{f}.{lname}.{i}.downsample.0", bp["downsample"]["conv"])
                put_bn(f"{f}.{lname}.{i}.downsample.1", bp["downsample"]["bn"])
    put_bilstm("SequenceModeling.0", params["seq0"])
    put_bilstm("SequenceModeling.1", params["seq1"])
    sd["Prediction.weight"] = _to_numpy(params["pred"]["w"])
    sd["Prediction.bias"] = _to_numpy(params["pred"]["b"])
    return sd


def convert_crnn_gen2(sd: dict) -> dict:
    """Reference gen2 ``VGGModel`` state dict -> crnn params pytree.

    ConvNet indices follow the sequential layout of
    ``VGGFeatureExtractor.ConvNet`` (blocks.py:115-180).
    """
    f = "FeatureExtraction.ConvNet"
    feat = {
        "conv0": _conv(sd, f + ".0", bias=True),
        "conv1": _conv(sd, f + ".3", bias=True),
        "conv2": _conv(sd, f + ".6", bias=True),
        "conv3": _conv(sd, f + ".8", bias=True),
        "conv4": _conv(sd, f + ".11"),
        "bn4": _bn(sd, f + ".12"),
        "conv5": _conv(sd, f + ".14"),
        "bn5": _bn(sd, f + ".15"),
        "conv6": _conv(sd, f + ".18", bias=True),
    }
    return {
        "feat": feat,
        "seq0": _bilstm(sd, "SequenceModeling.0"),
        "seq1": _bilstm(sd, "SequenceModeling.1"),
        "pred": _linear(sd, "Prediction"),
    }


def convert_craft(sd: dict) -> dict:
    """Reference CRAFT ``OCRFA`` state dict -> craft params pytree.

    The reference slices torchvision's vgg16_bn features at indices
    12/19/29/39 (blocks.py:42-49) — slice boundaries fall *mid-block*, right
    after a BatchNorm and before its ReLU, and conv 40/41 is never used.
    Convs in compute order sit at vgg16_bn indices
    0,3,7,10,14,17,20,24,27,30,34,37 with BN at index+1; the Sequential
    module names inside each slice keep the original vgg indices.
    """
    vgg = {}
    for n, (slice_no, idx) in enumerate(_CRAFT_VGG_CONVS):
        vgg[f"conv{n}"] = _conv(sd, f"basenet.slice{slice_no}.{idx}", bias=True)
        vgg[f"bn{n}"] = _bn(sd, f"basenet.slice{slice_no}.{idx + 1}")
    # slice5: maxpool(3,1,1), conv 3x3 dil 6, conv 1x1 (blocks.py:51-55)
    vgg["fc6"] = _conv(sd, "basenet.slice5.1", bias=True)
    vgg["fc7"] = _conv(sd, "basenet.slice5.2", bias=True)

    def double_conv(name):
        return {
            "conv1": _conv(sd, f"{name}.conv.0", bias=True),
            "bn1": _bn(sd, f"{name}.conv.1"),
            "conv2": _conv(sd, f"{name}.conv.3", bias=True),
            "bn2": _bn(sd, f"{name}.conv.4"),
        }

    return {
        "vgg": vgg,
        "upconv1": double_conv("upconv1"),
        "upconv2": double_conv("upconv2"),
        "upconv3": double_conv("upconv3"),
        "upconv4": double_conv("upconv4"),
        "conv_cls": [
            _conv(sd, f"conv_cls.{i}", bias=True) for i in (0, 2, 4, 6, 8)
        ],
    }


def _deconv(sd, prefix):
    """torch ConvTranspose2d weights keep their (Cin, Cout, kh, kw) layout."""
    return {"w": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}


def convert_dbnet(sd: dict, backbone: str = "resnet18") -> dict:
    """Reference DBNet ``SegDetectorModel`` state dict -> dbnet params.

    Checkpoint keys are ``model.module.backbone.*`` / ``model.module.
    decoder.*`` (DataParallel-wrapped BasicModel, DBNet/model/model.py:13-32);
    the decoder's binarize/thresh Sequentials index conv/bn/deconv at
    0/1/3/4/6 (decoders/seg_detector.py:46-55).
    """
    sd = {
        (k[len("model.module."):] if k.startswith("model.module.") else k): v
        for k, v in sd.items()
    }
    if backbone.startswith("mobilenetv3"):
        return _convert_dbnet_decoder(
            sd, convert_mobilenetv3(sd, mode=backbone.split("_", 1)[1]))
    layers = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[backbone]
    bottleneck = backbone == "resnet50"

    def block(prefix):
        p = {
            "conv1": _conv(sd, prefix + ".conv1"),
            "bn1": _bn(sd, prefix + ".bn1"),
            "bn2": _bn(sd, prefix + ".bn2"),
        }
        if prefix + ".conv2_offset.weight" in sd:
            p["conv2_offset"] = _conv(sd, prefix + ".conv2_offset", bias=True)
        p["conv2"] = _conv(sd, prefix + ".conv2")
        if bottleneck:
            p["conv3"] = _conv(sd, prefix + ".conv3")
            p["bn3"] = _bn(sd, prefix + ".bn3")
        if prefix + ".downsample.0.weight" in sd:
            p["downsample"] = {
                "conv": _conv(sd, prefix + ".downsample.0"),
                "bn": _bn(sd, prefix + ".downsample.1"),
            }
        return p

    bb = {
        "conv1": _conv(sd, "backbone.conv1"),
        "bn1": _bn(sd, "backbone.bn1"),
    }
    for li, n in enumerate(layers, start=1):
        bb[f"layer{li}"] = [block(f"backbone.layer{li}.{i}") for i in range(n)]

    return _convert_dbnet_decoder(sd, bb)


def _convert_dbnet_decoder(sd: dict, bb: dict) -> dict:
    """SegDetector / SegSpatialScaleDetector decoder weights -> params."""

    def head(prefix):
        return {
            "conv": _conv(sd, f"{prefix}.0"),
            "bn1": _bn(sd, f"{prefix}.1"),
            "deconv1": _deconv(sd, f"{prefix}.3"),
            "bn2": _bn(sd, f"{prefix}.4"),
            "deconv2": _deconv(sd, f"{prefix}.6"),
        }

    decoder = {
        "in5": _conv(sd, "decoder.in5"),
        "in4": _conv(sd, "decoder.in4"),
        "in3": _conv(sd, "decoder.in3"),
        "in2": _conv(sd, "decoder.in2"),
        "out5": _conv(sd, "decoder.out5.0"),
        "out4": _conv(sd, "decoder.out4.0"),
        "out3": _conv(sd, "decoder.out3.0"),
        "out2": _conv(sd, "decoder.out2"),
        "binarize": head("decoder.binarize"),
    }
    if "decoder.thresh.0.weight" in sd:
        decoder["thresh"] = head("decoder.thresh")
    if "decoder.concat_attention.conv.weight" in sd:
        decoder["concat_attention"] = _convert_asf(sd, "decoder.concat_attention")
    return {"backbone": bb, "decoder": decoder}


def _convert_asf(sd: dict, prefix: str) -> dict:
    """ScaleFeatureSelection weights (decoders/feature_attention.py:113-145).

    The attention flavour is sniffed from the state-dict keys: channel_wise
    -> scale_channel_spatial, fc1 -> scale_channel, else scale_spatial."""
    attn = prefix + ".enhanced_attention"
    p = {"conv": _conv(sd, prefix + ".conv", bias=True)}
    if attn + ".channel_wise.1.weight" in sd:
        p["attn"] = {
            "channel1": _conv(sd, attn + ".channel_wise.1"),
            "channel2": _conv(sd, attn + ".channel_wise.3"),
            "spatial1": _conv(sd, attn + ".spatial_wise.0"),
            "spatial2": _conv(sd, attn + ".spatial_wise.2"),
            "attention": _conv(sd, attn + ".attention_wise.0"),
        }
    elif attn + ".fc1.weight" in sd:
        p["attn"] = {
            "fc1": _conv(sd, attn + ".fc1"),
            "bn": _bn(sd, attn + ".bn"),
            "fc2": _conv(sd, attn + ".fc2"),
        }
    else:
        p["attn"] = {
            "spatial1": _conv(sd, attn + ".spatial_wise.0"),
            "spatial2": _conv(sd, attn + ".spatial_wise.2"),
            "attention": _conv(sd, attn + ".attention_wise.0"),
        }
    return p


def asf_attention_type(params: dict) -> str:
    """Attention flavour of converted ASF decoder params (for dbnet_apply)."""
    attn = params["decoder"]["concat_attention"]["attn"]
    if "channel1" in attn:
        return "scale_channel_spatial"
    if "fc1" in attn:
        return "scale_channel"
    return "scale_spatial"


# ---------------------------------------------------------------------------
# JAX -> torch exporters (inverses of the converters above): train or
# fine-tune in this framework, run in the reference torch pipeline.


def _put_conv(sd, prefix, p):
    sd[prefix + ".weight"] = np.transpose(_to_numpy(p["w"]), (3, 2, 0, 1))
    if "b" in p:
        sd[prefix + ".bias"] = _to_numpy(p["b"])


def _put_bn(sd, prefix, p):
    sd[prefix + ".weight"] = _to_numpy(p["scale"])
    sd[prefix + ".bias"] = _to_numpy(p["bias"])
    sd[prefix + ".running_mean"] = _to_numpy(p["mean"])
    sd[prefix + ".running_var"] = _to_numpy(p["var"])
    sd[prefix + ".num_batches_tracked"] = np.array(0, dtype=np.int64)


def _put_deconv(sd, prefix, p):
    # ConvTranspose2d keeps its torch (Cin, Cout, kh, kw) layout end to end
    sd[prefix + ".weight"] = _to_numpy(p["w"])
    sd[prefix + ".bias"] = _to_numpy(p["b"])


_CRAFT_VGG_CONVS = (
    (1, 0), (1, 3), (1, 7), (1, 10),
    (2, 14), (2, 17),
    (3, 20), (3, 24), (3, 27),
    (4, 30), (4, 34), (4, 37),
)


def export_craft(params) -> dict:
    """craft params pytree -> reference-keyed torch state dict.

    Exact inverse of :func:`convert_craft` (same vgg16_bn slice indices,
    blocks.py:42-49); loads strict into the reference ``OCRFA`` module.
    """
    sd = {}
    vgg = params["vgg"]
    for n, (slice_no, idx) in enumerate(_CRAFT_VGG_CONVS):
        _put_conv(sd, f"basenet.slice{slice_no}.{idx}", vgg[f"conv{n}"])
        _put_bn(sd, f"basenet.slice{slice_no}.{idx + 1}", vgg[f"bn{n}"])
    _put_conv(sd, "basenet.slice5.1", vgg["fc6"])
    _put_conv(sd, "basenet.slice5.2", vgg["fc7"])
    for name in ("upconv1", "upconv2", "upconv3", "upconv4"):
        u = params[name]
        _put_conv(sd, f"{name}.conv.0", u["conv1"])
        _put_bn(sd, f"{name}.conv.1", u["bn1"])
        _put_conv(sd, f"{name}.conv.3", u["conv2"])
        _put_bn(sd, f"{name}.conv.4", u["bn2"])
    for i, torch_idx in enumerate((0, 2, 4, 6, 8)):
        _put_conv(sd, f"conv_cls.{torch_idx}", params["conv_cls"][i])
    return sd


def export_dbnet(params, backbone: str = "resnet18",
                 data_parallel_prefix: bool = False) -> dict:
    """dbnet params pytree -> reference-keyed torch state dict.

    Exact inverse of :func:`convert_dbnet`.  Keys are bare
    ``backbone.*``/``decoder.*`` by default (the replica/BasicModel layout);
    ``data_parallel_prefix=True`` prepends ``model.module.`` to match the
    zoo checkpoint files (DBNet/model/model.py:24-32 DataParallel wrap).
    """
    sd = {}
    bb = params["backbone"]
    if backbone.startswith("mobilenetv3"):
        sd.update(export_mobilenetv3(bb))
    else:
        layers = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3)}[backbone]

        _put_conv(sd, "backbone.conv1", bb["conv1"])
        _put_bn(sd, "backbone.bn1", bb["bn1"])
        for li, n in enumerate(layers, start=1):
            for i in range(n):
                bp = bb[f"layer{li}"][i]
                prefix = f"backbone.layer{li}.{i}"
                _put_conv(sd, prefix + ".conv1", bp["conv1"])
                _put_bn(sd, prefix + ".bn1", bp["bn1"])
                _put_conv(sd, prefix + ".conv2", bp["conv2"])
                _put_bn(sd, prefix + ".bn2", bp["bn2"])
                if "conv2_offset" in bp:
                    _put_conv(sd, prefix + ".conv2_offset", bp["conv2_offset"])
                if "conv3" in bp:
                    _put_conv(sd, prefix + ".conv3", bp["conv3"])
                    _put_bn(sd, prefix + ".bn3", bp["bn3"])
                if "downsample" in bp:
                    _put_conv(sd, prefix + ".downsample.0", bp["downsample"]["conv"])
                    _put_bn(sd, prefix + ".downsample.1", bp["downsample"]["bn"])

    dec = params["decoder"]

    def put_head(prefix, p):
        _put_conv(sd, f"{prefix}.0", p["conv"])
        _put_bn(sd, f"{prefix}.1", p["bn1"])
        _put_deconv(sd, f"{prefix}.3", p["deconv1"])
        _put_bn(sd, f"{prefix}.4", p["bn2"])
        _put_deconv(sd, f"{prefix}.6", p["deconv2"])

    for name in ("in5", "in4", "in3", "in2", "out2"):
        _put_conv(sd, f"decoder.{name}", dec[name])
    for name in ("out5", "out4", "out3"):
        _put_conv(sd, f"decoder.{name}.0", dec[name])
    put_head("decoder.binarize", dec["binarize"])
    if "thresh" in dec:
        put_head("decoder.thresh", dec["thresh"])
    if "concat_attention" in dec:
        ca = dec["concat_attention"]
        prefix = "decoder.concat_attention"
        attn = prefix + ".enhanced_attention"
        _put_conv(sd, prefix + ".conv", ca["conv"])
        a = ca["attn"]
        if "channel1" in a:
            _put_conv(sd, attn + ".channel_wise.1", a["channel1"])
            _put_conv(sd, attn + ".channel_wise.3", a["channel2"])
            _put_conv(sd, attn + ".spatial_wise.0", a["spatial1"])
            _put_conv(sd, attn + ".spatial_wise.2", a["spatial2"])
            _put_conv(sd, attn + ".attention_wise.0", a["attention"])
        elif "fc1" in a:
            _put_conv(sd, attn + ".fc1", a["fc1"])
            _put_bn(sd, attn + ".bn", a["bn"])
            _put_conv(sd, attn + ".fc2", a["fc2"])
        else:
            _put_conv(sd, attn + ".spatial_wise.0", a["spatial1"])
            _put_conv(sd, attn + ".spatial_wise.2", a["spatial2"])
            _put_conv(sd, attn + ".attention_wise.0", a["attention"])
    if data_parallel_prefix:
        sd = {f"model.module.{k}": v for k, v in sd.items()}
    return sd


def convert_mobilenetv3(sd: dict, mode: str = "large") -> dict:
    """Reference MobileNetV3 backbone state dict -> mobilenetv3 params.

    Keys are ``backbone.features.{i}...`` (backbones/mobilenetv3.py:120-197):
    features.0 is the stem conv_bn, features.1..n MobileBottlenecks whose
    ``conv`` Sequential indexes pw/bn/dw/bn/SE/pw-linear/bn at 0/1/3/4/5/7/8,
    and features.n+1 the final conv_1x1_bn.  The classifier tail (avgpool +
    1x1 conv, unused by the detector forward) is ignored."""
    sd = {
        (k[len("model.module."):] if k.startswith("model.module.") else k): v
        for k, v in sd.items()
    }
    n_blocks = {"large": 15, "small": 11}[mode]
    p = {
        "stem": _conv(sd, "backbone.features.0.0"),
        "stem_bn": _bn(sd, "backbone.features.0.1"),
        "blocks": [],
    }
    for i in range(1, n_blocks + 1):
        base = f"backbone.features.{i}.conv"
        blk = {
            "pw": _conv(sd, base + ".0"),
            "pw_bn": _bn(sd, base + ".1"),
            "dw": _conv(sd, base + ".3"),
            "dw_bn": _bn(sd, base + ".4"),
            "pw2": _conv(sd, base + ".7"),
            "pw2_bn": _bn(sd, base + ".8"),
        }
        if base + ".5.fc.0.weight" in sd:
            # torch Linear (out, in) -> right-multiplied (in, out)
            blk["se"] = {
                "fc1": np.transpose(sd[base + ".5.fc.0.weight"]),
                "fc2": np.transpose(sd[base + ".5.fc.2.weight"]),
            }
        p["blocks"].append(blk)
    p["last"] = _conv(sd, f"backbone.features.{n_blocks + 1}.0")
    p["last_bn"] = _bn(sd, f"backbone.features.{n_blocks + 1}.1")
    return p


def export_mobilenetv3(p: dict) -> dict:
    """mobilenetv3 backbone params -> reference-keyed torch state dict.

    Exact inverse of :func:`convert_mobilenetv3` (large/small is implicit
    in ``len(p["blocks"])``); key layout per backbones/mobilenetv3.py:120-197.
    """
    sd = {}
    _put_conv(sd, "backbone.features.0.0", p["stem"])
    _put_bn(sd, "backbone.features.0.1", p["stem_bn"])
    for i, blk in enumerate(p["blocks"], start=1):
        base = f"backbone.features.{i}.conv"
        _put_conv(sd, base + ".0", blk["pw"])
        _put_bn(sd, base + ".1", blk["pw_bn"])
        _put_conv(sd, base + ".3", blk["dw"])
        _put_bn(sd, base + ".4", blk["dw_bn"])
        if "se" in blk:
            # right-multiplied (in, out) -> torch Linear (out, in)
            sd[base + ".5.fc.0.weight"] = np.transpose(
                _to_numpy(blk["se"]["fc1"]))
            sd[base + ".5.fc.2.weight"] = np.transpose(
                _to_numpy(blk["se"]["fc2"]))
        _put_conv(sd, base + ".7", blk["pw2"])
        _put_bn(sd, base + ".8", blk["pw2_bn"])
    n = len(p["blocks"])
    _put_conv(sd, f"backbone.features.{n + 1}.0", p["last"])
    _put_bn(sd, f"backbone.features.{n + 1}.1", p["last_bn"])
    return sd


# ---------------------------------------------------------------------------
# Orbax persistence


def save_pytree(path: str, pytree) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, pytree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: str, like=None):
    """Restore a pytree; ``like`` restores into that structure (needed for
    optax NamedTuple states, which otherwise come back as plain dicts)."""
    import orbax.checkpoint as ocp

    import jax
    import jax.numpy as jnp

    ckptr = ocp.StandardCheckpointer()
    if like is None:
        return ckptr.restore(path)
    like = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), like)
    return ckptr.restore(path, like)


# ---------------------------------------------------------------------------
# Trained-blob pickles (the artifacts scripts/eval_farsi.py --save-params and
# scripts/eval_selftrained.py --save-craft emit).  ONE loader owns the blob
# schema — the CLI, the serving front-ends and the eval scripts all inject
# weights through these, so the meta conventions cannot fork per call site.
# ---------------------------------------------------------------------------

#: accepted ``meta["detector"]`` spellings -> canonical detect_network name
DETECTOR_KIND_ALIASES = {
    "craft": "craft",
    "dbnet": "dbnet18",    # eval_selftrained --detector takes craft|dbnet
    "dbnet18": "dbnet18",
}


_BLOB_CACHE: dict = {}


def _load_blob(path: str) -> dict:
    # server startup reads the same pickle for params, then again for
    # calibration batches; a 1-entry mtime/size-keyed cache makes the
    # second read free without changing any caller signature
    import pickle

    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    cached = _BLOB_CACHE.get(key)
    if cached is not None:
        return cached
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if "params" not in blob:
        raise ValueError(f"{path}: not a trained blob (no 'params' key)")
    _BLOB_CACHE.clear()
    _BLOB_CACHE[key] = blob
    return blob


def load_detector_blob(path: str, default_kind: str = "craft"):
    """Load a trained-detector pickle -> ``(kind, params, meta)``.

    ``kind`` is normalised to a canonical detect_network name ("craft" or
    "dbnet18") via :data:`DETECTOR_KIND_ALIASES`; ``default_kind`` applies
    when the blob predates the ``meta["detector"]`` key.
    """
    blob = _load_blob(path)
    meta = blob.get("meta", {})
    raw = meta.get("detector", default_kind)
    kind = DETECTOR_KIND_ALIASES.get(raw)
    if kind is None:
        raise ValueError(
            f"{path}: unknown detector kind {raw!r} "
            f"(accepted: {sorted(DETECTOR_KIND_ALIASES)})")
    return kind, blob["params"], meta


def build_detector_from_blob(path: str, default_kind: str = "craft"):
    """Detector-pickle -> ``(kind, detector_instance, meta)``."""
    kind, params, meta = load_detector_blob(path, default_kind)
    if kind == "dbnet18":
        from ocrfa_tpu.detector_db import DBNetDetector

        return kind, DBNetDetector(params), meta
    from ocrfa_tpu.detector import CraftDetector

    return kind, CraftDetector(params), meta


def load_recognizer_blob(path: str, default_charset: str | None = None):
    """Load a trained-recognizer pickle -> ``(params, charset, meta)``.

    ``charset`` comes from ``meta["charset"]``; bare fine-tune blobs (no
    meta) fall back to ``default_charset`` (callers pass the production
    arabic_g1 set).
    """
    blob = _load_blob(path)
    meta = blob.get("meta", {})
    charset = meta.get("charset", default_charset)
    if charset is None:
        raise ValueError(
            f"{path}: blob has no meta.charset and no default given")
    return blob["params"], charset, meta


def load_recognizer_calibration(path: str):
    """The blob's calibration batches (``blob["calib"]``), or ``None``.

    eval_farsi --save-params stores the training-time BN-calibration
    batches alongside the params; serving uses them to build the static
    int8 tower at startup (``Recognizer(quantized="static")``) without
    needing fresh production data."""
    blob = _load_blob(path)
    calib = blob.get("calib")
    return list(calib) if calib else None


def build_recognizer_from_blob(path: str, default_charset: str | None = None):
    """Recognizer-pickle -> ``(recognizer, charset, meta)``.

    ``meta["family"]`` selects the wrapper: ``"trocr"`` builds a
    :class:`~ocrfa_tpu.pipeline.TrocrRecognizer` (heads/max_len from the
    blob meta — the pretrain_trocr --save-params contract); anything else
    is a CRNN :class:`~ocrfa_tpu.pipeline.Recognizer`.
    """
    params, charset, meta = load_recognizer_blob(path, default_charset)
    from ocrfa_tpu.decode import CTCLabelConverter

    conv = CTCLabelConverter(charset)
    if meta.get("family") == "trocr":
        from ocrfa_tpu.pipeline import TrocrRecognizer

        rec = TrocrRecognizer(params, conv, heads=meta.get("heads", 8),
                              max_len=meta.get("max_len", 48))
    else:
        from ocrfa_tpu.pipeline import Recognizer

        rec = Recognizer(params, conv, variant=meta.get("variant", "gen1"))
    return rec, charset, meta
