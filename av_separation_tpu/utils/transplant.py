"""Weight transplant: reference PyTorch state_dict -> this framework's pytree.

Lets a user of the reference (danieleschmidt/AV-Separation-Transformer) carry
trained checkpoints straight into the TPU framework: given the reference
model's ``state_dict()`` as a name->ndarray mapping, produce the
``{'params': ..., 'batch_stats': ...}`` variables for
:class:`av_separation_tpu.models.AVSeparationTransformer` such that eval-mode
forward outputs match to float32 tolerance (gated in tests/test_parity.py).

Layout conversions handled here:
  - torch ``Linear.weight`` is (out, in); flax Dense kernels are (in, out).
  - torch ``Conv1d.weight`` is (out, in, k); flax is (k, in, out).
  - torch ``Conv2d.weight`` is (out, in, kh, kw); flax is (kh, kw, in, out).
  - torch ``nn.MultiheadAttention`` packs q/k/v into one (3d, d)
    ``in_proj_weight`` (reference model.py:155); here they are separate
    q/k/v Dense layers (sliced by rows).
  - ``BatchNorm2d`` running stats land in the 'batch_stats' collection.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


Array = np.ndarray


def _linear(sd: Mapping[str, Array], torch_name: str) -> Dict[str, Array]:
    return {"kernel": np.ascontiguousarray(sd[f"{torch_name}.weight"].T),
            "bias": sd[f"{torch_name}.bias"]}


def _conv1d(sd: Mapping[str, Array], torch_name: str) -> Dict[str, Array]:
    return {"kernel": np.ascontiguousarray(
                sd[f"{torch_name}.weight"].transpose(2, 1, 0)),
            "bias": sd[f"{torch_name}.bias"]}


def _conv2d(sd: Mapping[str, Array], torch_name: str) -> Dict[str, Array]:
    return {"kernel": np.ascontiguousarray(
                sd[f"{torch_name}.weight"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{torch_name}.bias"]}


def _layernorm(sd: Mapping[str, Array], torch_name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{torch_name}.weight"],
            "bias": sd[f"{torch_name}.bias"]}


def _mha(sd: Mapping[str, Array], torch_name: str) -> Dict[str, Array]:
    w = sd[f"{torch_name}.in_proj_weight"]   # (3d, d)
    b = sd[f"{torch_name}.in_proj_bias"]     # (3d,)
    d = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": np.ascontiguousarray(w[i * d:(i + 1) * d].T),
            "bias": b[i * d:(i + 1) * d],
        }
    out["out_proj"] = _linear(sd, f"{torch_name}.out_proj")
    return out


def _encoder_layer(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
    }


def _transformer(sd: Mapping[str, Array], prefix: str,
                 num_layers: int) -> Dict[str, Array]:
    return {f"layer_{i}": _encoder_layer(sd, f"{prefix}.layers.{i}")
            for i in range(num_layers)}


def from_reference_state_dict(
        sd: Mapping[str, Array], *, num_encoder_layers: int = 2,
        num_fusion_layers: int = 2) -> Tuple[Dict, Dict]:
    """Convert a reference ``state_dict`` (name -> ndarray) to
    ``(params, batch_stats)`` pytrees for ``AVSeparationTransformer``."""
    params: Dict = {}
    stats: Dict = {}

    params["audio_encoder"] = {
        "conv1": _conv1d(sd, "audio_encoder.input_proj.0"),
        "conv2": _conv1d(sd, "audio_encoder.input_proj.2"),
        "transformer": _transformer(sd, "audio_encoder.transformer",
                                    num_encoder_layers),
    }

    ve: Dict = {
        "frame_proj": _linear(sd, "visual_encoder.frame_proj"),
        "transformer": _transformer(sd, "visual_encoder.transformer",
                                    num_encoder_layers),
    }
    ve_stats: Dict = {}
    # Reference conv stem nn.Sequential indices: conv at 0/3/6, BN at 1/4/7
    # (reference model.py:81-92).
    for j, (ci, bi) in enumerate(((0, 1), (3, 4), (6, 7)), start=1):
        ve[f"conv{j}"] = _conv2d(sd, f"visual_encoder.conv.{ci}")
        ve[f"bn{j}"] = {"scale": sd[f"visual_encoder.conv.{bi}.weight"],
                        "bias": sd[f"visual_encoder.conv.{bi}.bias"]}
        ve_stats[f"bn{j}"] = {
            "mean": sd[f"visual_encoder.conv.{bi}.running_mean"],
            "var": sd[f"visual_encoder.conv.{bi}.running_var"],
        }
    params["visual_encoder"] = ve
    stats["visual_encoder"] = ve_stats

    fusion: Dict = {"norm": _layernorm(sd, "fusion.norm")}
    for i in range(num_fusion_layers):
        p = f"fusion.layers.{i}"
        fusion[f"layer_{i}"] = {
            "cross_attn": _mha(sd, f"{p}.cross_attn"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "ff1": _linear(sd, f"{p}.ff.0"),
            "ff2": _linear(sd, f"{p}.ff.3"),
        }
    params["fusion"] = fusion

    params["decoder"] = {
        "fc1": _linear(sd, "decoder.decoder.0"),
        "fc2": _linear(sd, "decoder.decoder.3"),
    }
    return params, stats


def load_golden_state_dict(npz_path: str) -> Dict[str, Array]:
    """Load a golden .npz whose weight arrays are stored under 'w::<name>'."""
    data = np.load(npz_path)
    return {k[len("w::"):]: data[k] for k in data.files
            if k.startswith("w::")}
