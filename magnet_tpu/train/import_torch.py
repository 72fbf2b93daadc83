"""Import reference PyTorch (Lightning) checkpoints into magnet_tpu params.

The reference's trained weights live in Lightning ``.ckpt`` files whose
``state_dict`` keys are fully determined by its module definitions
(reference models/magnet_cnn.py, models/mpnn.py, models/fno_1d.py,
models/backbones/{mlp,edsr}.py).  This module maps those names/layouts onto
our flax param trees so per-layer activation parity and nRMSE runs can use
the reference's actual trained weights (BASELINE.md).

Conventions:
  * torch Linear weight (out, in)  -> flax Dense kernel (in, out): transpose.
  * torch ConvNd weight (out, in, *k) -> flax Conv kernel (*k, in, out).
  * torch LayerNorm weight/bias    -> flax scale/bias.
  * reference MLP = ModuleList([Linear, act, Linear, act, ..., Linear]) so
    Linears sit at even indices 0, 2, ..., 2*n_hidden.
  * our split first layers (pre-projection) take contiguous column chunks
    of the reference's concatenated weight (see nn/graphnet.py,
    nn/gnn_layer.py) — the chunk order matches the reference's concat
    order.
  * scanned stacks (GraphProcessor steps, EDSR res blocks, MPNN layers)
    stack the per-step torch tensors on a new leading axis.

Use :func:`load_lightning_state_dict` to read a ``.ckpt`` with torch, or
pass any ``{name: np.ndarray}`` mapping.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def load_lightning_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _lin(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": np.ascontiguousarray(sd[f"{prefix}.bias"]),
    }


def _ln(sd, prefix):
    return {
        "scale": np.ascontiguousarray(sd[f"{prefix}.weight"]),
        "bias": np.ascontiguousarray(sd[f"{prefix}.bias"]),
    }


def _conv(sd, prefix):
    w = sd[f"{prefix}.weight"]          # (out, in, *k)
    k = w.ndim - 2
    perm = tuple(range(2, 2 + k)) + (1, 0)
    return {
        "Conv_0": {
            "kernel": np.ascontiguousarray(w.transpose(perm)),
            "bias": np.ascontiguousarray(sd[f"{prefix}.bias"]),
        }
    }


def _mlp(sd, prefix, n_hidden):
    """reference MLP(hidden_list=[h]*n_hidden) -> our MLP subtree."""
    out = {}
    for j in range(n_hidden + 1):
        out[f"Linear_{j}"] = {"Dense_0": _lin(sd, f"{prefix}.layers.{2 * j}")}
    return out


def _seq_mlp_ln(sd, prefix, n_hidden):
    """reference Sequential(MLP, LayerNorm) -> (mlp_subtree, ln_subtree)."""
    return _mlp(sd, f"{prefix}.0", n_hidden), {"LayerNorm_0": _ln(sd, f"{prefix}.1")}


def _stack(trees):
    """Stack a list of identically-structured numpy trees on axis 0."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def _interaction_step(sd, prefix, mlp_layers, latent):
    """One reference InteractionNetwork -> our _ProcStep 'step' subtree
    (edge MLP first layer split into e_w_xi/e_w_xj/e_w_e chunks)."""
    w0 = sd[f"{prefix}.edge_fn.0.layers.0.weight"]   # (H, 3C)
    b0 = sd[f"{prefix}.edge_fn.0.layers.0.bias"]
    c = latent
    step = {
        "e_w_xi": {"kernel": np.ascontiguousarray(w0[:, :c].T)},
        "e_w_xj": {"kernel": np.ascontiguousarray(w0[:, c : 2 * c].T)},
        "e_w_e": {
            "kernel": np.ascontiguousarray(w0[:, 2 * c :].T),
            "bias": np.ascontiguousarray(b0),
        },
    }
    # remaining edge Linears: hidden at torch indices 2..2*(mlp_layers-1),
    # final at 2*mlp_layers — stacked into the raw tail params the fused
    # Pallas edge kernel consumes (nn/graphnet.py)
    h = int(w0.shape[0])
    if mlp_layers > 1:
        step["w_rest"] = np.stack([
            np.ascontiguousarray(sd[f"{prefix}.edge_fn.0.layers.{2 * j}.weight"].T)
            for j in range(1, mlp_layers)
        ])
        step["b_rest"] = np.stack([
            np.ascontiguousarray(sd[f"{prefix}.edge_fn.0.layers.{2 * j}.bias"])
            for j in range(1, mlp_layers)
        ])
    else:
        step["w_rest"] = np.zeros((0, h, h), np.float32)
        step["b_rest"] = np.zeros((0, h), np.float32)
    out_lin = _lin(sd, f"{prefix}.edge_fn.0.layers.{2 * mlp_layers}")
    step["w_out"] = out_lin["kernel"]
    step["b_out"] = out_lin["bias"]
    ln = _ln(sd, f"{prefix}.edge_fn.1")
    step["ln_scale"] = ln["scale"]
    step["ln_bias"] = ln["bias"]
    node_mlp, node_ln = _seq_mlp_ln(sd, f"{prefix}.node_fn", mlp_layers)
    step["node_fn"] = {"layers_0": node_mlp, "layers_1": node_ln}
    return step


def import_edsr(sd: Mapping[str, np.ndarray], prefix: str, res_layers: int) -> dict:
    """Reference EDSR (backbones/edsr.py:32-59) -> our EDSR param subtree.
    ``prefix`` is the submodule path ('' for a standalone EDSR state dict)."""
    p = f"{prefix}." if prefix else ""
    return {
        "Conv_0": _conv(sd, f"{p}head_conv"),
        "Conv_1": _conv(sd, f"{p}tail_conv"),
        "res_layers": {
            "ResBlock_0": _stack(
                [
                    {
                        "Conv_0": _conv(sd, f"{p}res_layers.{i}.conv_1"),
                        "Conv_1": _conv(sd, f"{p}res_layers.{i}.conv_2"),
                    }
                    for i in range(res_layers)
                ]
            )
        },
    }


def import_magnet_cnn(sd: Mapping[str, np.ndarray], hp: Mapping[str, Any]) -> dict:
    """Build the flax param tree for MAgNetCNN1D/2D cores from a reference
    MAgNetCNN(_2d) state_dict."""
    mlp_layers = int(hp.get("mlp_layers", 4))
    latent = int(hp.get("latent_dim", 32))
    res_layers = int(hp.get("res_layers", 4))
    mp = int(hp.get("num_message_passing_steps", 10))

    p: dict = {}
    p["encoder"] = import_edsr(sd, "encoder", res_layers)

    # INR proj_head = Sequential(MLP, LayerNorm)
    mlp_t, ln_t = _seq_mlp_ln(sd, "proj_head", mlp_layers)
    p["continuous_decoder"] = {"MLP_0": mlp_t, "LayerNorm_0": ln_t}

    p["projector"] = _mlp(sd, "projector", mlp_layers)

    # GraphEncoder: node_fn -> MLP_0/LayerNorm_0, edge_fn -> MLP_1/LayerNorm_1
    nm, nl = _seq_mlp_ln(sd, "_encoder.node_fn", mlp_layers)
    em, el = _seq_mlp_ln(sd, "_encoder.edge_fn", mlp_layers)
    p["_encoder"] = {
        "MLP_0": nm, "LayerNorm_0": nl, "MLP_1": em, "LayerNorm_1": el,
    }

    # Processor: stack InteractionNetworks
    steps = [
        _interaction_step(sd, f"_processor.gnn_stacks.{i}", mlp_layers, latent)
        for i in range(mp)
    ]
    p["_processor"] = {"steps": {"step": _stack(steps)}}

    p["_decoder"] = {"MLP_0": _mlp(sd, "_decoder.node_fn", mlp_layers)}
    return {"params": p}


def import_mpnn(sd: Mapping[str, np.ndarray], hp: Mapping[str, Any],
                pos_dim: int = 1) -> dict:
    """Reference MPNN(_2d) state_dict -> MPNNCore params."""
    hidden = int(hp.get("hidden_features", 128))
    n_layers = int(hp.get("hidden_layer", 5))
    tw = int(hp.get("time_window", 16))

    p: dict = {
        "embed_0": {"Dense_0": _lin(sd, "embedding_mlp.0")},
        "embed_1": {"Dense_0": _lin(sd, "embedding_mlp.2")},
    }

    def layer_tree(i):
        w = sd[f"gnn_layers.{i}.message_net_1.0.weight"]  # (H, 2C+tw+P+1)
        b = sd[f"gnn_layers.{i}.message_net_1.0.bias"]
        c = hidden
        o = 0
        chunks = {}
        for name, width in [
            ("msg1_xi", c), ("msg1_xj", c), ("msg1_u", tw),
            ("msg1_pos", pos_dim), ("msg1_var", 1),
        ]:
            chunks[name] = {"kernel": np.ascontiguousarray(w[:, o : o + width].T)}
            o += width
        chunks["msg1_var"]["bias"] = np.ascontiguousarray(b)
        m2 = _lin(sd, f"gnn_layers.{i}.message_net_2.0")
        chunks["msg2_w"] = m2["kernel"]
        chunks["msg2_b"] = m2["bias"]
        chunks["upd1"] = {"Dense_0": _lin(sd, f"gnn_layers.{i}.update_net_1.0")}
        chunks["upd2"] = {"Dense_0": _lin(sd, f"gnn_layers.{i}.update_net_2.0")}
        return chunks

    p["gnn_layers"] = {
        "layer": _stack([layer_tree(i) for i in range(n_layers)])
    }

    # decoder CNN: Conv at torch index 0; second Conv at 1 (tw==10 1D, no
    # Swish) or 2 otherwise
    second = 1 if (tw == 10 and pos_dim == 1) else 2
    p["output_mlp"] = {
        "Conv_0": _conv(sd, "output_mlp.0"),
        "Conv_1": _conv(sd, f"output_mlp.{second}"),
    }
    return {"params": p}


def import_fno_1d(sd: Mapping[str, np.ndarray], hp: Mapping[str, Any]) -> dict:
    num_layers = int(hp.get("num_layers", 5))
    p: dict = {
        "fc0": {"Dense_0": _lin(sd, "fc0")},
        "fc1": {"Dense_0": _lin(sd, "fc1")},
        "fc2": {"Dense_0": _lin(sd, "fc2")},
    }
    for i in range(num_layers):
        w = sd[f"fourier_layers.{i}.weights"]            # complex (in,out,modes)
        p[f"fourier_{i}"] = {
            "weights_real": np.ascontiguousarray(w.real.astype(np.float32)),
            "weights_imag": np.ascontiguousarray(w.imag.astype(np.float32)),
        }
        cw = sd[f"conv_layers.{i}.weight"]               # (out, in, 1)
        p[f"conv_{i}"] = {
            "Dense_0": {
                "kernel": np.ascontiguousarray(cw[:, :, 0].T),
                "bias": np.ascontiguousarray(sd[f"conv_layers.{i}.bias"]),
            }
        }
    return {"params": p}


def import_magnet_gnn(sd: Mapping[str, np.ndarray], hp: Mapping[str, Any]) -> dict:
    """Reference MAgNetGNN state_dict -> MAgNetGNNCore params.

    Two encoder/processor stacks ('encoder'/'processor' over LR and
    '_encoder'/'_processor' over LR∪HR, reference magnet_gnn.py:175-222);
    proj_head is a single Linear (magnet_gnn.py:193)."""
    mlp_layers = int(hp.get("mlp_layers", 4))
    latent = int(hp.get("latent_dim", 128))
    mp = int(hp.get("num_message_passing_steps", 5))

    def enc(prefix):
        nm, nl = _seq_mlp_ln(sd, f"{prefix}.node_fn", mlp_layers)
        em, el = _seq_mlp_ln(sd, f"{prefix}.edge_fn", mlp_layers)
        return {"MLP_0": nm, "LayerNorm_0": nl, "MLP_1": em, "LayerNorm_1": el}

    def proc(prefix):
        steps = [
            _interaction_step(sd, f"{prefix}.gnn_stacks.{i}", mlp_layers, latent)
            for i in range(mp)
        ]
        return {"steps": {"step": _stack(steps)}}

    p: dict = {
        "encoder": enc("encoder"),
        "processor": proc("processor"),
        "_encoder": enc("_encoder"),
        "_processor": proc("_processor"),
        "_decoder": {"MLP_0": _mlp(sd, "_decoder.node_fn", mlp_layers)},
        "projector": _mlp(sd, "projector", mlp_layers),
        "continuous_decoder": {"Linear_0": {"Dense_0": _lin(sd, "proj_head")}},
    }
    return {"params": p}


def import_fno_2d(sd: Mapping[str, np.ndarray], hp: Mapping[str, Any]) -> dict:
    num_layers = int(hp.get("num_layers", 5))
    p: dict = {
        "fc0": {"Dense_0": _lin(sd, "fc0")},
        "fc1": {"Dense_0": _lin(sd, "fc1")},
        "fc2": {"Dense_0": _lin(sd, "fc2")},
    }
    for i in range(num_layers):
        for wi in (1, 2):
            w = sd[f"fourier_layers.{i}.weights{wi}"]
            p.setdefault(f"fourier_{i}", {})[f"weights{wi}_real"] = (
                np.ascontiguousarray(w.real.astype(np.float32))
            )
            p[f"fourier_{i}"][f"weights{wi}_imag"] = np.ascontiguousarray(
                w.imag.astype(np.float32)
            )
        cw = sd[f"conv_layers.{i}.weight"]               # (out, in, 1, 1)
        p[f"conv_{i}"] = {
            "Dense_0": {
                "kernel": np.ascontiguousarray(cw[:, :, 0, 0].T),
                "bias": np.ascontiguousarray(sd[f"conv_layers.{i}.bias"]),
            }
        }
    return {"params": p}


def import_no_interaction(sd: Mapping[str, np.ndarray], hp: Mapping[str, Any]) -> dict:
    """Reference MAgNetCNN_no_interaction state_dict -> NoInteractionCore
    params (EDSR + recurrent INR Linear + LSTM seq2seq attention +
    LayerNorm + decoder MLP, reference magnet_cnn_no_interaction.py:52-82)."""
    mlp_layers = int(hp.get("mlp_layers", 1))
    res_layers = int(hp.get("res_layers", 16))
    lstm_layers = int(hp.get("lstm_layers", 4))

    def lstm(prefix):
        out = {}
        for k in range(lstm_layers):
            out[f"layer_{k}"] = {
                "w_ih": np.ascontiguousarray(sd[f"{prefix}.weight_ih_l{k}"].T),
                "w_hh": np.ascontiguousarray(sd[f"{prefix}.weight_hh_l{k}"].T),
                "b_ih": np.ascontiguousarray(sd[f"{prefix}.bias_ih_l{k}"]),
                "b_hh": np.ascontiguousarray(sd[f"{prefix}.bias_hh_l{k}"]),
            }
        return out

    p: dict = {
        "encoder": import_edsr(sd, "encoder", res_layers),
        "recurrent_inr": {
            "rec_step": {"proj_head": {"Dense_0": _lin(sd, "proj_head")}}
        },
        "seq2seq": {
            "lstm_encoder": lstm("lstm_encoder"),
            "att_decoder": {
                "lstm_decoder": lstm("lstm_decoder"),
                "attn_1": {"Dense_0": _lin(sd, "attn.0")},
                "attn_2": {
                    "kernel": np.ascontiguousarray(sd["attn.2.weight"].T)
                },
            },
        },
        "layernorm": {"LayerNorm_0": _ln(sd, "layernorm")},
        "decoder": _mlp(sd, "decoder", mlp_layers),
    }
    return {"params": p}


IMPORTERS = {
    "magnet_cnn": import_magnet_cnn,
    "magnet_cnn_2d": import_magnet_cnn,
    "mpnn": lambda sd, hp: import_mpnn(sd, hp, pos_dim=1),
    "mpnn_2d": lambda sd, hp: import_mpnn(sd, hp, pos_dim=2),
    "fno_1d": import_fno_1d,
    "fno_2d": import_fno_2d,
    "magnet_gnn": import_magnet_gnn,
    "magnet_cnn_no_interaction": import_no_interaction,
}


def import_state_dict(model_name: str, sd: Mapping[str, np.ndarray],
                      hp: Mapping[str, Any]) -> dict:
    if model_name not in IMPORTERS:
        raise NotImplementedError(
            f"no torch importer for {model_name!r} yet (have: {sorted(IMPORTERS)})"
        )
    # strip Lightning's "model." prefix variants if present
    if sd and all(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    return IMPORTERS[model_name](sd, hp)
