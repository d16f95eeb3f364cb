"""Key-path boolean masks over parameter pytrees.

Used to exclude layers (by any name component, e.g. ``bias``/``scale``/
``embedding``) from weight decay and from optimizer-state quantization.
Behavior parity with ``create_mask`` at ``/root/reference/training_utils.py:116-131``:
a leaf is ``False`` when any excluded name appears anywhere in its key path.
"""

import jax


def _path_names(path) -> tuple:
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        elif hasattr(entry, "idx"):
            names.append(str(entry.idx))
        else:
            names.append(str(entry))
    return tuple(names)


def create_mask(pytree, excluded_layer_list: list):
    """Boolean pytree: True = included, False = any excluded name in key path."""

    def _included(path) -> bool:
        names = _path_names(path)
        return not any(excluded in names for excluded in excluded_layer_list)

    return jax.tree_util.tree_map_with_path(
        lambda path, _leaf: _included(path), pytree
    )
