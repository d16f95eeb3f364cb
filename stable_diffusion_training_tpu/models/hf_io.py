"""Checkpoint interop with the HuggingFace diffusers/transformers formats.

The reference loads weights with HF ``from_pretrained`` and saves with
``pipeline.save_pretrained`` (``/root/reference/training_utils.py:177-250,
986-1025``). This module provides the equivalent surface with zero diffusers
dependency: converters between PyTorch state dicts (safetensors files in a
diffusers checkpoint directory) and this framework's NHWC/Flax param trees,
in both directions, so checkpoints round-trip with the HF ecosystem.

Conversions:
- Linear ``weight (out,in)``     <-> ``kernel (in,out)``
- Conv   ``weight (O,I,kh,kw)``  <-> ``kernel (kh,kw,I,O)``
- Norm   ``weight``/``bias``     <-> ``scale``/``bias``
- Embedding ``weight``           <-> ``embedding``
"""

import json
import os
from typing import Any, Dict, Optional

import numpy as np

# names whose `weight` is a norm scale, not a matmul kernel
_NORM_NAMES = {
    "norm",
    "norm1",
    "norm2",
    "norm3",
    "conv_norm_out",
    "group_norm",
    "layer_norm1",
    "layer_norm2",
    "final_layer_norm",
    "norm_out",
}
_EMBED_NAMES = {"token_embedding", "position_embedding"}


def _assign(tree: Dict[str, Any], path, value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _torch_key_to_flax_path(key: str):
    """Map a dotted torch key to (flax path tuple, leaf transform kind)."""
    parts = key.split(".")
    # fold numeric components into their parent: down_blocks.0 -> down_blocks_0
    folded = []
    for part in parts:
        if part.isdigit() and folded:
            folded[-1] = f"{folded[-1]}_{part}"
        else:
            folded.append(part)

    leaf = folded[-1]
    path = folded[:-1]

    # torch wraps attention output / CLIP mlp in containers we flatten
    path = [p.replace("to_out_0", "to_out") for p in path]
    new_path = []
    for p in path:
        if p == "mlp":
            continue  # mlp.fc1 -> mlp_fc1
        if p in ("fc1", "fc2") and not new_path[-1:] == ["mlp"]:
            new_path.append(f"mlp_{p}")
            continue
        new_path.append(p)
    path = new_path

    if leaf == "weight":
        last = path[-1] if path else ""
        if last in _EMBED_NAMES:
            kind = "embedding"
        elif last in _NORM_NAMES or last.startswith("norm"):
            kind = "norm_scale"
        else:
            kind = "matmul"  # disambiguated by ndim at conversion time
        return tuple(path), kind
    if leaf == "bias":
        return tuple(path), "bias"
    return tuple(path + [leaf]), "raw"


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    strip_prefix: str = "",
    skip_prefixes: tuple = (),
    dtype=None,
) -> Dict[str, Any]:
    """Convert a flat torch state dict to a nested flax param tree."""
    tree: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix) :]
        if any(key.startswith(p) for p in skip_prefixes):
            continue
        if key.endswith("position_ids"):  # CLIP buffer, not a param
            continue
        value = np.asarray(value)
        path, kind = _torch_key_to_flax_path(key)
        if kind == "embedding":
            _assign(tree, path + ("embedding",), value)
        elif kind == "norm_scale":
            _assign(tree, path + ("scale",), value)
        elif kind == "bias":
            _assign(tree, path + ("bias",), value)
        elif kind == "matmul":
            if value.ndim == 4:  # conv OIHW -> HWIO
                _assign(tree, path + ("kernel",), value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:  # linear (out,in) -> (in,out)
                _assign(tree, path + ("kernel",), value.transpose(1, 0))
            else:  # 1D "weight" on an unrecognized norm layer
                _assign(tree, path + ("scale",), value)
        else:
            _assign(tree, path, value)
    if dtype is not None:
        import jax

        tree = jax.tree.map(lambda x: x.astype(dtype), tree)
    return tree


def flax_params_to_torch_state_dict(
    params: Dict[str, Any], prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Inverse conversion: nested flax tree -> flat torch-layout state dict.

    Path components with trailing ``_N`` indices are re-expanded to dotted
    torch indices; kernels are transposed back to torch layouts.
    """
    flat: Dict[str, np.ndarray] = {}

    def _unfold(name: str) -> str:
        # torch layer names whose trailing _N is part of the name, not a
        # ModuleList index (diffusers TimestepEmbedding.linear_1/linear_2)
        if name in ("linear_1", "linear_2"):
            return name
        pieces = name.split("_")
        # re-expand every trailing-digit segment: down_blocks_0 -> down_blocks.0
        out, acc = [], []
        for piece in pieces:
            if piece.isdigit():
                out.append("_".join(acc)) if acc else None
                out.append(piece)
                acc = []
            else:
                acc.append(piece)
        if acc:
            out.append("_".join(acc))
        return ".".join(out)

    def _walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, path + [k])
            return
        value = np.asarray(node)
        leaf = path[-1]
        parent = path[:-1]
        torch_parent = [_unfold(p) for p in parent]
        # container re-wrapping
        torch_parent = [
            p.replace("to_out", "to_out.0").replace("mlp_fc", "mlp.fc")
            for p in torch_parent
        ]
        base = ".".join(torch_parent)
        if leaf == "kernel":
            if value.ndim == 4:
                flat[f"{base}.weight"] = value.transpose(3, 2, 0, 1)
            else:
                flat[f"{base}.weight"] = value.transpose(1, 0)
        elif leaf == "scale":
            flat[f"{base}.weight"] = value
        elif leaf == "embedding":
            flat[f"{base}.weight"] = value
        elif leaf == "bias":
            flat[f"{base}.bias"] = value
        else:
            flat[f"{base}.{leaf}" if base else leaf] = value

    _walk(params, [])
    if prefix:
        flat = {f"{prefix}{k}": v for k, v in flat.items()}
    return flat


# --- safetensors / directory IO ---------------------------------------------


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def save_safetensors(state_dict: Dict[str, np.ndarray], path: str, metadata=None):
    from safetensors.numpy import save_file

    save_file(
        {k: np.ascontiguousarray(v) for k, v in state_dict.items()},
        path,
        metadata=metadata or {"format": "np"},
    )


def _find_weights_file(directory: str) -> Optional[str]:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        path = os.path.join(directory, name)
        if os.path.exists(path):
            return path
    return None


def load_torch_weights(directory: str) -> Dict[str, np.ndarray]:
    """Read a diffusers/transformers weight file (safetensors preferred)."""
    path = _find_weights_file(directory)
    if path is None:
        raise FileNotFoundError(f"no weight file found in {directory}")
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_config_json(directory: str) -> Dict[str, Any]:
    with open(os.path.join(directory, "config.json")) as f:
        return json.load(f)


# --- model-specific entry points ---------------------------------------------


def load_unet_params(directory: str, dtype=None) -> Dict[str, Any]:
    return torch_state_dict_to_flax(load_torch_weights(directory), dtype=dtype)


def load_vae_params(directory: str, dtype=None) -> Dict[str, Any]:
    """Newer diffusers renamed the VAE mid-block attention projections
    (to_q/to_k/to_v/to_out.0); alias them back to the 0.21.4-era names this
    model uses (query/key/value/proj_attn)."""
    sd = load_torch_weights(directory)
    renames = {
        ".to_q.": ".query.",
        ".to_k.": ".key.",
        ".to_v.": ".value.",
        ".to_out.0.": ".proj_attn.",
    }

    def _rekey(key: str) -> str:
        if ".attentions." in key:
            for old, new in renames.items():
                key = key.replace(old, new)
        return key

    return torch_state_dict_to_flax({_rekey(k): v for k, v in sd.items()}, dtype=dtype)


def load_text_encoder_params(directory: str, dtype=None) -> Dict[str, Any]:
    """transformers CLIPTextModel: strip the ``text_model.`` prefix and fold
    ``embeddings.*`` / ``encoder.layers`` to this module's flat layout."""
    sd = load_torch_weights(directory)
    sd = {
        k.replace("text_model.", "")
        .replace("embeddings.", "")
        .replace("encoder.layers", "layers"): v
        for k, v in sd.items()
    }
    return torch_state_dict_to_flax(sd, dtype=dtype)


def load_text_encoder_2_params(directory: str, dtype=None) -> Dict[str, Any]:
    """transformers CLIPTextModelWithProjection (SDXL text_encoder_2): keep
    the ``text_model`` nesting (this model wraps the tower as a submodule),
    fold embeddings/encoder.layers, keep ``text_projection`` at top level."""
    sd = load_torch_weights(directory)
    sd = {
        k.replace("text_model.embeddings.", "text_model.")
        .replace("text_model.encoder.layers", "text_model.layers"): v
        for k, v in sd.items()
    }
    return torch_state_dict_to_flax(sd, dtype=dtype)


def save_unet_params(params, directory: str) -> None:
    os.makedirs(directory, exist_ok=True)
    save_safetensors(
        flax_params_to_torch_state_dict(params),
        os.path.join(directory, "diffusion_pytorch_model.safetensors"),
        metadata={"format": "pt"},
    )


def save_vae_params(params, directory: str) -> None:
    save_unet_params(params, directory)


def save_text_encoder_params(params, directory: str) -> None:
    os.makedirs(directory, exist_ok=True)
    sd = flax_params_to_torch_state_dict(params)

    def _rekey(k: str) -> str:
        if k.startswith(("token_embedding", "position_embedding")):
            return f"text_model.embeddings.{k}"
        if k.startswith("layers."):
            return f"text_model.encoder.{k}"
        return f"text_model.{k}"

    save_safetensors(
        {_rekey(k): v for k, v in sd.items()},
        os.path.join(directory, "model.safetensors"),
        metadata={"format": "pt"},
    )
