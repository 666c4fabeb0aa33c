"""Number-theory planning tests (reference analog: factor logic exercised by
test/plan_chunking.unit.test.js and the axis-kind policy tests)."""

import numpy as np
import pytest

from webgpufft_tpu.utils import factors as F


def test_factorize_supported_radices():
    assert F.factorize_supported_radices(1) == []
    assert F.factorize_supported_radices(8) == [8]
    assert F.factorize_supported_radices(2310) == [11, 7, 5, 3, 2]
    assert F.factorize_supported_radices(17) is None
    assert F.factorize_supported_radices(34) is None
    with pytest.raises(ValueError):
        F.factorize_supported_radices(0)


def test_is_smooth():
    for n in (1, 2, 16, 1024, 2310, 13 * 13 * 8):
        assert F.is_smooth(n)
    for n in (17, 34, 97, 0, -4):
        assert not F.is_smooth(n)


def test_primes_and_roots():
    assert F.is_prime(2) and F.is_prime(13) and F.is_prime(101)
    assert not F.is_prime(1) and not F.is_prime(91)
    for p in (3, 5, 7, 17, 97, 101, 4099):
        g = F.primitive_root_prime(p)
        seen = {pow(g, i, p) for i in range(p - 1)}
        assert seen == set(range(1, p))
    with pytest.raises(ValueError):
        F.primitive_root_prime(8)


def test_next_smooth():
    assert F.next_smooth_at_least(1) == 1
    assert F.next_smooth_at_least(17) == 18
    assert F.next_smooth_at_least(2048) == 2048
    n = F.next_smooth_at_least(2 * 4099 - 1)
    assert n >= 2 * 4099 - 1 and F.is_smooth(n)


def test_split_sublengths():
    for n in (2, 4, 1024, 2310, 4096, 2 ** 20, 13 * 11 * 7 * 5):
        subs = F.split_sublengths(n, 32)
        assert np.prod(subs) == n
        assert all(s <= 32 for s in subs)
    # sub-lengths can exceed the cap only when a prime factor does
    assert F.split_sublengths(13, 8) == [13]


def test_split_two_balanced():
    assert F.split_two_balanced(1024, 128) == (32, 32)
    n1, n2 = F.split_two_balanced(2048, 128)
    assert n1 * n2 == 2048 and max(n1, n2) <= 128
    assert F.split_two_balanced(17, 128) is None
    assert F.split_two_balanced(2, 128) is None  # needs two nontrivial factors
