import numpy as np
import jax.numpy as jnp

from tensornetworks_tpu.core import (
    all_bitstrings,
    bits_to_index,
    flip_index,
    generate_all_binary_outcomes,
    get_binary_key,
    get_outcome_tuple,
    jnp_bits_to_index,
    jnp_index_to_bits,
    popcount,
)


def test_all_bitstrings_matches_reference_order():
    # Reference utils.py:77-91: lexicographic MSB-first enumeration.
    assert generate_all_binary_outcomes(2) == [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert generate_all_binary_outcomes(1) == [(0,), (1,)]
    assert generate_all_binary_outcomes(0) == [()]
    b = all_bitstrings(3)
    assert b.shape == (8, 3)
    assert tuple(b[5]) == (1, 0, 1)


def test_bits_index_roundtrip():
    for n in [0, 1, 3, 6]:
        b = all_bitstrings(n)
        np.testing.assert_array_equal(bits_to_index(b), np.arange(2**n))
    jb = jnp_index_to_bits(jnp.arange(8), 3)
    np.testing.assert_array_equal(np.asarray(jnp_bits_to_index(jb)), np.arange(8))


def test_flip_index():
    # stein_utils.py:7-11: flip_bit((0,0,0), 0) == (1,0,0) -> index 4 for n=3.
    assert flip_index(0, 3, 0) == 4
    assert flip_index(0, 3, 2) == 1
    assert flip_index(5, 3, 1) == 7


def test_popcount():
    np.testing.assert_array_equal(popcount(np.array([0, 1, 2, 3, 255])), [0, 1, 1, 2, 8])


def test_key_codecs():
    assert get_binary_key((1, 0, 1)) == "101"
    assert get_outcome_tuple("101") == (1, 0, 1)
