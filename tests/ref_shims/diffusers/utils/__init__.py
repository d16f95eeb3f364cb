"""``diffusers.utils`` shim: just enough for the reference schedulers."""

import dataclasses
from collections import OrderedDict


class BaseOutput(OrderedDict):
    """Dataclass-compatible output container (attribute + dict access)."""

    def __post_init__(self):
        for field in dataclasses.fields(self):
            value = getattr(self, field.name)
            if value is not None:
                self[field.name] = value

    def __getitem__(self, key):
        if isinstance(key, str):
            return dict(self)[key]
        return tuple(self.values())[key]


class PushToHubMixin:
    """No-op: hub upload is irrelevant for local parity tests."""
