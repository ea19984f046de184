"""Pytree parameters -> reference PyTorch state_dict (inverse of
`torch_import.py`), for interoperability with the reference tooling
(e.g. synthesizing through the reference inference script with weights
trained here). Produces numpy arrays keyed by the reference's names;
wrap with `torch.from_numpy` to load into the torch modules.
"""

from __future__ import annotations

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    """WIO [k, in, out] -> torch [out, in, k]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _linear(sd: dict, prefix: str, p: dict) -> None:
    sd[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    sd[prefix + ".bias"] = np.asarray(p["b"])


def _conv(sd: dict, prefix: str, p: dict) -> None:
    if "v" in p:
        sd[prefix + ".weight_v"] = _conv_w(p["v"])
        sd[prefix + ".weight_g"] = np.asarray(p["g"]).reshape(-1, 1, 1)
        sd[prefix + ".bias"] = np.asarray(p["b"])
    else:
        sd[prefix + ".weight"] = _conv_w(p["w"])
        sd[prefix + ".bias"] = np.asarray(p["b"])


def efts_cnn_to_state_dict(params: dict, cfg) -> dict:
    """Inverse of `torch_import.efts_cnn_from_state_dict`."""
    sd: dict = {}
    sd["text_embedding_table.weight"] = np.asarray(params["text_embedding"]["table"])
    for name, n_layers in [
        ("text_encoder", cfg.n_text_encoder_layer),
        ("mel_encoder", cfg.n_mel_encoder_layer),
        ("decoder", cfg.n_decoder_layer),
    ]:
        for i in range(n_layers):
            _conv(sd, f"{name}.layers.{i}.conv.0", params[name]["layers"][i])
    _linear(sd, "text_encoder_key", params["text_key"])
    if "text_value" in params:
        _linear(sd, "text_encoder_value", params["text_value"])
    _linear(sd, "mel_prenet.0", params["mel_prenet"])
    if "mel_query_fc" in params:
        _linear(sd, "mel_query_fc", params["mel_query_fc"])
    _linear(sd, "mel_output_layer", params["mel_out"])
    dp = params["duration_predictor"]
    for i, (conv_p, norm_p) in enumerate(zip(dp["convs"], dp["norms"])):
        _conv(sd, f"duration_predictor.conv.{i}.0", conv_p)
        sd[f"duration_predictor.conv.{i}.2.weight"] = np.asarray(norm_p["scale"])
        sd[f"duration_predictor.conv.{i}.2.bias"] = np.asarray(norm_p["bias"])
    _linear(sd, "duration_predictor.linear", dp["out"])
    return sd


def _convT_w(w: np.ndarray) -> np.ndarray:
    """WIO [k, in, out] -> torch ConvTranspose1d [in, out, k]."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 2, 0)))


def hifigan_generator_to_state_dict(params: dict, cfg) -> dict:
    """Inverse of `torch_import.hifigan_generator_from_state_dict`: export
    a generator trained here (the reference ships no vocoder trainer) to
    the official HiFi-GAN `generator_v1` state_dict layout
    (`/root/reference/nntts/vocoders/hifigan_model.py:95-145`), weight-
    normed ('.weight_v/.weight_g') or folded ('.weight') per the pytree.
    Wrap values with `torch.from_numpy` and save as {"generator": sd} for
    `load_hifigan_generator` (`hifigan_model.py:18-28`)."""
    sd: dict = {}

    def put_transposed(prefix, p):
        # torch weight_norm(dim=0) on ConvTranspose1d: g is [in,1,1],
        # i.e. g flattened to axis 0, same reshape as the Conv1d case
        if "v" in p:
            sd[prefix + ".weight_v"] = _convT_w(p["v"])
            sd[prefix + ".weight_g"] = np.asarray(p["g"]).reshape(-1, 1, 1)
            sd[prefix + ".bias"] = np.asarray(p["b"])
        else:
            sd[prefix + ".weight"] = _convT_w(p["w"])
            sd[prefix + ".bias"] = np.asarray(p["b"])

    _conv(sd, "conv_pre", params["conv_pre"])
    for i, p in enumerate(params["ups"]):
        put_transposed(f"ups.{i}", p)
    for i, block in enumerate(params["resblocks"]):
        if cfg.resblock == "1":
            for j, p in enumerate(block["convs1"]):
                _conv(sd, f"resblocks.{i}.convs1.{j}", p)
            for j, p in enumerate(block["convs2"]):
                _conv(sd, f"resblocks.{i}.convs2.{j}", p)
        else:
            for j, p in enumerate(block["convs"]):
                _conv(sd, f"resblocks.{i}.convs.{j}", p)
    _conv(sd, "conv_post", params["conv_post"])
    return sd
