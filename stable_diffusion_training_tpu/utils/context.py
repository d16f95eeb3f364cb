"""Text-context window math shared by the train step, the offline context
precompute, and the AOT shape builder.

The BOS/EOS-strip concat (reference ``training_utils.py:649-674``): window 0
keeps everything but its EOS, middle windows drop both BOS and EOS, the last
window keeps everything but its BOS. One definition here so the in-step
(jnp, traced) and offline (numpy) paths can never diverge.
"""

import jax.numpy as jnp


def concat_context_windows(hidden, strip_bos_eos_token: bool):
    """``(B, concat, win, dim)`` per-window hidden states -> the
    ``(B, tokens, dim)`` cross-attention context.

    Works on traced jnp arrays and numpy arrays alike (returns a jnp array
    for numpy input — ``np.asarray`` it on host paths). Note the reference
    formula degenerates at ``concat == 1``: window 0 and window -1 are the
    SAME window, so its tokens appear twice (2*(win-1) total) — reproduced
    deliberately for parity; use ``strip_bos_eos_token=False`` for a plain
    single-window context."""
    b = hidden.shape[0]
    dim = hidden.shape[-1]
    if not strip_bos_eos_token:
        return hidden.reshape(b, -1, dim)
    return jnp.concatenate(
        [
            hidden[:, 0, :-1, :],
            hidden[:, 1:-1, 1:-1, :].reshape(b, -1, dim),
            hidden[:, -1, 1:, :],
        ],
        axis=1,
    )


def context_token_count(
    window: int, concat_count: int, strip_bos_eos_token: bool
) -> int:
    """Token count ``concat_context_windows`` produces — the static shape
    the AOT compiler must bake into dummy batches."""
    if not strip_bos_eos_token:
        return window * concat_count
    if concat_count == 1:
        return 2 * (window - 1)  # the degenerate duplicated-window case
    return (window - 2) * concat_count + 2
