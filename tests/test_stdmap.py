"""The compat stdmap simulator must match a real libstdc++ unordered_map."""

import random

import pytest

from ahsoka_tpu.compat import std_iteration_order
from ahsoka_tpu.compat import _native


def _native_or_skip(keys):
    result = _native.stdmap_order(keys)
    if result is None:
        pytest.skip("native compat helper unavailable (no C++ toolchain)")
    return result


@pytest.mark.parametrize("n", [1, 5, 13, 14, 29, 30, 100, 1200, 6000])
def test_sequential_keys(n):
    keys = list(range(n))
    assert std_iteration_order(keys) == _native_or_skip(keys)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_keys_with_duplicates(seed):
    rng = random.Random(seed)
    keys = [rng.randrange(0, 10_000_000) for _ in range(3000)]
    keys += keys[:500]  # duplicate first-touches are no-ops
    assert std_iteration_order(keys) == _native_or_skip(keys)


def test_sparse_large_ids():
    keys = [13, 1_000_013, 26, 39, 7, 2_000_000_000, 52]
    assert std_iteration_order(keys) == _native_or_skip(keys)


def test_small_reverse_order_heads():
    # distinct buckets insert at the head of the global list -> reversed
    assert std_iteration_order([1, 2, 3, 4]) == [4, 3, 2, 1]
