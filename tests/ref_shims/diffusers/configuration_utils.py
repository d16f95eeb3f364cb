"""``diffusers.configuration_utils`` shim: ConfigMixin + register_to_config.

Reproduces the one behavior the reference schedulers rely on: the decorated
``__init__``'s bound arguments (defaults applied) become ``self.config`` with
attribute access.
"""

import functools
import inspect
from types import SimpleNamespace


class FrozenDict(SimpleNamespace):
    """Attribute- and item-access view over the registered config."""

    def __getitem__(self, key):
        return getattr(self, key)

    def get(self, key, default=None):
        return getattr(self, key, default)


class ConfigMixin:
    config_name = None

    def register_to_config(self, **kwargs):
        internal = dict(getattr(self, "_internal_dict", {}))
        internal.update(kwargs)
        self._internal_dict = internal

    @property
    def config(self):
        return FrozenDict(**getattr(self, "_internal_dict", {}))


def register_to_config(init):
    @functools.wraps(init)
    def inner_init(self, *args, **kwargs):
        signature = inspect.signature(init)
        bound = signature.bind(self, *args, **kwargs)
        bound.apply_defaults()
        config = {
            name: value
            for name, value in bound.arguments.items()
            if name != "self" and not name.startswith("_")
        }
        self.register_to_config(**config)
        init(self, *args, **kwargs)

    return inner_init
