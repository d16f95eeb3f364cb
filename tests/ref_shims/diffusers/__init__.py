"""Minimal ``diffusers`` stand-in so the UNMODIFIED reference sources at
``/root/reference`` import on this box (no network, no diffusers wheel).

Only the symbols the reference schedulers actually touch are provided
(``/root/reference/schedulers/scheduling_utils_flax.py:24``,
``scheduling_ddpm_flax.py:25``, ``scheduling_ddim_flax.py:24``):
``utils.BaseOutput``, ``utils.PushToHubMixin``,
``configuration_utils.ConfigMixin``/``register_to_config``.

This package exists purely for the parity tests
(``tests/test_reference_parity.py``) that run the real reference code
element-for-element against this framework; it is NOT part of the library.
"""

from . import configuration_utils, utils  # noqa: F401
