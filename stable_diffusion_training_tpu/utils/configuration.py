"""Minimal diffusers-layout-compatible configuration registry.

Schedulers and models record their constructor kwargs into a frozen ``.config``
namespace and can round-trip it through ``<subfolder>/scheduler_config.json`` /
``config.json`` files laid out exactly like a HuggingFace diffusers checkpoint
directory, so checkpoints produced here are loadable by diffusers and vice versa
(reference relies on diffusers ``ConfigMixin`` for this; see
``/root/reference/schedulers/scheduling_utils_flax.py:56-185``).

No diffusers dependency: this is a small, explicit re-design — a frozen mapping
plus two JSON helpers — rather than decorator-based config capture.
"""

import dataclasses
import inspect
import json
import os
from types import MappingProxyType
from typing import Any, Dict, Optional


class FrozenConfig:
    """Immutable attribute/namespace view over a config dict."""

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", MappingProxyType(dict(data)))

    def __getattr__(self, name):
        try:
            return self._data[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __getitem__(self, name):
        return self._data[name]

    def __contains__(self, name):
        return name in self._data

    def get(self, name, default=None):
        return self._data.get(name, default)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._data)

    def __setattr__(self, name, value):
        raise AttributeError("FrozenConfig is immutable")

    def __repr__(self):
        return f"FrozenConfig({dict(self._data)!r})"


class ConfigurableMixin:
    """Base for objects whose constructor kwargs define a serializable config.

    Subclasses call ``self._register_config(locals())`` (or pass an explicit
    dict) at the end of ``__init__``; keys listed in ``ignore_for_config`` are
    dropped (the reference drops ``dtype`` the same way).
    """

    config_name: str = "config.json"
    ignore_for_config = ("dtype",)

    def _register_config(self, values: Dict[str, Any]) -> None:
        cfg = {
            k: v
            for k, v in values.items()
            if k not in ("self", "__class__") and k not in self.ignore_for_config
        }
        self._internal_config = FrozenConfig(cfg)

    @property
    def config(self) -> FrozenConfig:
        return self._internal_config

    # --- serialization -----------------------------------------------------
    def save_config(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        payload = {
            "_class_name": self._diffusers_class_name(),
            "_diffusers_version": "0.21.4",
        }
        payload.update(_jsonify(self.config.to_dict()))
        path = os.path.join(save_directory, self.config_name)
        with open(path, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)

    # alias used by checkpoint writers
    def save_pretrained(self, save_directory: str, **_ignored) -> None:
        self.save_config(save_directory)

    @classmethod
    def load_config(
        cls, pretrained_path: str, subfolder: Optional[str] = None
    ) -> Dict[str, Any]:
        directory = (
            os.path.join(pretrained_path, subfolder) if subfolder else pretrained_path
        )
        path = os.path.join(directory, cls.config_name)
        with open(path, "r") as f:
            config = json.load(f)
        config.pop("_class_name", None)
        config.pop("_diffusers_version", None)
        return config

    @classmethod
    def from_config(cls, config: Dict[str, Any], **overrides):
        config = dict(config)
        config.update(overrides)
        sig = inspect.signature(cls.__init__)
        accepted = {
            k: v for k, v in config.items() if k in sig.parameters and k != "self"
        }
        return cls(**accepted)

    def _diffusers_class_name(self) -> str:
        """Name written to ``_class_name`` so diffusers can re-load the file."""
        name = type(self).__name__
        # our classes drop the reference's Flax prefix; restore it on export
        if not name.startswith("Flax"):
            name = "Flax" + name
        return name


def _jsonify(obj):
    """Best-effort conversion of config values to JSON-safe types."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if dataclasses.is_dataclass(obj):
        return _jsonify(dataclasses.asdict(obj))
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if hasattr(obj, "tolist"):  # jnp arrays
        return obj.tolist()
    return obj
