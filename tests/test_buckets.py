"""Aspect-ratio bucket math tests (reference training_utils.py:134-174)."""

import numpy as np

from stable_diffusion_training_tpu.data.buckets import (
    all_bucket_resolutions,
    assign_bucket,
    calculate_resolution_array,
)


def test_bucket_properties_512():
    res = calculate_resolution_array(512**2, 256, 64)
    # all divisible by 64
    assert np.all(res % 64 == 0)
    # area within cap
    assert np.all(res[:, 0] * res[:, 1] <= 512**2)
    # mirrored: for every (w,h) the (h,w) pair exists
    pairs = {tuple(r) for r in res}
    assert all((h, w) in pairs for (w, h) in pairs)
    # square bucket present exactly once
    squares = [tuple(r) for r in res if r[0] == r[1]]
    assert len(squares) == len(set(squares))


def test_bucket_known_values():
    res = calculate_resolution_array(512**2, 256, 64)
    pairs = {tuple(r) for r in res}
    assert (512, 512) in pairs
    assert (256, 1024) in pairs
    assert (1024, 256) in pairs


def test_bucket_no_square_duplication():
    res = calculate_resolution_array(576**2, 384, 64)
    as_tuples = [tuple(r) for r in res]
    assert len(as_tuples) == len(set(as_tuples))


def test_all_bucket_resolutions_concat():
    res = all_bucket_resolutions([576, 704], [384, 512])
    assert res.ndim == 2 and res.shape[1] == 2
    r0 = calculate_resolution_array(576**2, 384, 64)
    r1 = calculate_resolution_array(704**2, 512, 64)
    assert len(res) == len(r0) + len(r1)


def test_assign_bucket_prefers_matching_aspect():
    res = calculate_resolution_array(512**2, 256, 64)
    w, h = assign_bucket(1000, 1000, res)
    assert (w, h) == (512, 512)
    w, h = assign_bucket(512, 2048, res)
    assert w < h


def test_bucket_rounding_cuts_program_count():
    """Raising bucket_rounding shrinks the AOT program zoo (compile-count
    lever, SURVEY.md §7 hard part 5)."""
    from stable_diffusion_training_tpu.data.buckets import (
        calculate_resolution_array,
    )

    fine = calculate_resolution_array(1024**2, 512, rounding=64)
    coarse = calculate_resolution_array(1024**2, 512, rounding=128)
    assert len(coarse) < len(fine)
    assert all(w % 128 == 0 and h % 128 == 0 for w, h in coarse)
    assert all(w * h <= 1024**2 for w, h in coarse)


def test_all_unique_resolutions_dedupes_across_tiers():
    from stable_diffusion_training_tpu.train.aot import all_unique_resolutions
    from test_train import make_config

    cfg = make_config(image_area_root=[512, 512], minimum_axis_length=[448, 448])
    res = all_unique_resolutions(cfg)
    as_tuples = [tuple(r) for r in res]
    assert len(as_tuples) == len(set(as_tuples))


def test_degenerate_bucket_config_raises():
    import pytest

    from stable_diffusion_training_tpu.data.buckets import (
        calculate_resolution_array,
    )

    with pytest.raises(ValueError, match="rounding"):
        calculate_resolution_array(32**2, 32, rounding=64)
