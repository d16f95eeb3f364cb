"""Import the UNMODIFIED reference sources (`/root/reference`) on this box.

The reference targets jax~0.4.x / optax<0.2 / diffusers==0.21.4; this helper
bridges the gaps WITHOUT editing reference files:

- ``diffusers`` resolves to the minimal shim in ``tests/ref_shims``
  (ConfigMixin/register_to_config/BaseOutput/PushToHubMixin — the only
  symbols the reference schedulers import);
- ``jax.tree_map`` (removed in jax 0.9) is aliased to ``jax.tree.map``
  (used by ``lion_quant.py:99,135``);
- ``optax._src.alias._scale_by_learning_rate`` (made public as
  ``optax.scale_by_learning_rate``) is re-injected
  (``lion_quant.py:8,211``);
- ``jnp.clip(a_min=...)`` (renamed ``min``/``max``) is accepted again
  (``scheduling_ddpm_flax.py:177,180``).

Every patch is value-compatible: the aliases point at the exact same
present-day implementations, so reference numerics are unchanged.
"""

import sys

import jax
import jax.numpy as jnp
import optax
import optax._src.alias

REFERENCE_ROOT = "/root/reference"
SHIM_ROOT = __file__.rsplit("/", 1)[0] + "/ref_shims"

_installed = False


def _compat_clip(x, a_min=None, a_max=None, **kwargs):
    lo = kwargs.pop("min", a_min)
    hi = kwargs.pop("max", a_max)
    return _orig_clip(x, lo, hi, **kwargs)


_orig_clip = jnp.clip


def install():
    """Idempotently install path entries + compatibility aliases."""
    global _installed
    if _installed:
        return
    for path in (SHIM_ROOT, REFERENCE_ROOT):
        if path not in sys.path:
            sys.path.insert(0, path)
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    if not hasattr(jax.random, "KeyArray"):  # type annotation only
        jax.random.KeyArray = jax.Array
    if not hasattr(optax._src.alias, "_scale_by_learning_rate"):
        optax._src.alias._scale_by_learning_rate = optax.scale_by_learning_rate
    if not hasattr(optax._src.alias, "ScalarOrSchedule"):
        optax._src.alias.ScalarOrSchedule = optax._src.base.ScalarOrSchedule
    jnp.clip = _compat_clip
    jax.numpy.clip = _compat_clip
    _installed = True


class legacy_batched_normal:
    """Context manager: let ``jax.random.normal`` accept the reference's
    legacy ``split(key, num=1)``-shaped (1, 2) raw key
    (``scheduling_ddpm_flax.py:267-272``) by folding it to the single key it
    contains — the same bits modern code reaches with ``split(key, 1)[0]``."""

    def __enter__(self):
        self._orig = jax.random.normal

        def _normal(key, *args, **kwargs):
            if hasattr(key, "shape") and key.ndim == 2 and key.shape[0] == 1:
                key = key[0]
            return self._orig(key, *args, **kwargs)

        jax.random.normal = _normal
        return self

    def __exit__(self, *exc):
        jax.random.normal = self._orig
        return False


def load_reference_lion():
    install()
    import lion_quant  # noqa: F401  (resolves from /root/reference)

    assert lion_quant.__file__.startswith(REFERENCE_ROOT), lion_quant.__file__
    return lion_quant


def load_reference_schedulers():
    install()
    import schedulers  # noqa: F401  (resolves from /root/reference)
    import schedulers.scheduling_ddim_flax as ddim
    import schedulers.scheduling_ddpm_flax as ddpm
    import schedulers.scheduling_utils_flax as utils

    assert ddpm.__file__.startswith(REFERENCE_ROOT), ddpm.__file__
    return utils, ddpm, ddim
